from image_matching_tpu.utils.config import load_config, dict_update
from image_matching_tpu.utils.logging import get_logger

__all__ = ["load_config", "dict_update", "get_logger"]
