from image_matching_tpu.ops.pallas.attention import flash_attention, attention_reference

__all__ = ["flash_attention", "attention_reference"]
