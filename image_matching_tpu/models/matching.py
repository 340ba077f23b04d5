"""SuperPoint + SuperGlue composition — the reference's `Matching` wrapper
(superglue/models/matching.py:47-82 / matching_test.py:47-82) as one flax
module whose whole forward (detect both images → match) is a single jitted
XLA program. No per-image Python, no list stacking, no host sync.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from image_matching_tpu.models.superglue import SuperGlue
from image_matching_tpu.models.superpoint import (
    SuperPointBN,
    SuperPointVGG,
    superpoint_postprocess,
)
from image_matching_tpu.structs import Keypoints


@struct.dataclass
class MatchingConfig:
    """Typed config covering the reference's argparse/YAML knobs
    (superpoint_glue_test.py:16-56)."""

    # SuperPoint
    backbone: str = struct.field(pytree_node=False, default="bn")  # "bn" | "vgg"
    # run the conv stack in space-to-depth layout with layout changes
    # fused into the convs/pools: exact same network & params, measured
    # 1.21x faster SuperPoint inference on v5e (needs H, W % 16 == 0;
    # training still uses the plain path internally)
    s2d_backbone: bool = struct.field(pytree_node=False, default=True)
    descriptor_dim: int = struct.field(pytree_node=False, default=256)
    max_keypoints: int = struct.field(pytree_node=False, default=1024)
    keypoint_threshold: float = struct.field(pytree_node=False, default=0.005)
    nms_radius: int = struct.field(pytree_node=False, default=4)
    border: int = struct.field(pytree_node=False, default=4)
    # log-patch soft-argmax keypoint refinement (the reference's
    # HA-export frontend step, model_wrap.py:146-176). Off by default:
    # reference test-pipeline parity uses integer NMS coordinates, and
    # the K-point patch gather costs throughput; enable for
    # registration-quality work (cli/evaluate does).
    subpixel: bool = struct.field(pytree_node=False, default=False)
    # SuperGlue
    keypoint_encoder: Tuple[int, ...] = struct.field(
        pytree_node=False, default=(32, 64, 128, 256)
    )
    gnn_layers: int = struct.field(pytree_node=False, default=18)
    sinkhorn_iterations: int = struct.field(pytree_node=False, default=100)
    match_threshold: float = struct.field(pytree_node=False, default=0.2)
    attention_impl: str = struct.field(pytree_node=False, default="auto")
    # einsum-attention logits storage dtype ("float32" | "bfloat16") —
    # bf16 halves the SG stack's dominant HBM term (v5e probe_sg: 5.29
    # -> 5.07 ms at B=4/K=1024, and it removes the batch-8 logits
    # cliff entirely: 2.25 -> 1.26 ms/pair-side-set). Inference-only
    # default; trainers build SuperGlue directly with f32 logits. See
    # MultiHeadedAttention.logits_dtype; quality bars re-checked by
    # scripts/tpu_quality_gate.py.
    logits_dtype: str = struct.field(pytree_node=False, default="bfloat16")
    sinkhorn_impl: str = struct.field(pytree_node=False, default="auto")
    # 2B-batched GNN sides (see SuperGlue.stack_sides — loses at B=4/K=1k)
    stack_sides: bool = struct.field(pytree_node=False, default=False)
    # compute dtype for conv/attention matmuls ("float32" | "bfloat16")
    compute_dtype: str = struct.field(pytree_node=False, default="bfloat16")
    # s2d backbone layout: "h" (2,1) or "2x2" — see SuperPointBN
    s2d_layout: str = struct.field(pytree_node=False, default="h")

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @staticmethod
    def self_trained_128() -> "MatchingConfig":
        """The repo's self-trained pipeline (superpoint_glue_test.py:20-35):
        descriptor_dim 128, kenc [32, 64, 128], 30 Sinkhorn iters."""
        return MatchingConfig(
            backbone="bn",
            descriptor_dim=128,
            keypoint_encoder=(32, 64, 128),
            sinkhorn_iterations=30,
            match_threshold=0.1,
        )


class Matching(nn.Module):
    config: MatchingConfig = MatchingConfig()

    def setup(self):
        cfg = self.config
        sp_cls = SuperPointBN if cfg.backbone == "bn" else SuperPointVGG
        self.superpoint = sp_cls(
            descriptor_dim=cfg.descriptor_dim, dtype=cfg.dtype,
            s2d=cfg.s2d_backbone, s2d_layout=cfg.s2d_layout,
        )
        self.superglue = SuperGlue(
            descriptor_dim=cfg.descriptor_dim,
            keypoint_encoder=cfg.keypoint_encoder,
            gnn_layers=cfg.gnn_layers,
            sinkhorn_iterations=cfg.sinkhorn_iterations,
            match_threshold=cfg.match_threshold,
            attention_impl=cfg.attention_impl,
            logits_dtype=cfg.logits_dtype,
            sinkhorn_impl=cfg.sinkhorn_impl,
            stack_sides=cfg.stack_sides,
            dtype=cfg.dtype,
        )

    def detect(self, image: jax.Array, train: bool = False) -> Keypoints:
        cfg = self.config
        outputs = self.superpoint(image, train=train)
        return superpoint_postprocess(
            outputs,
            max_keypoints=cfg.max_keypoints,
            threshold=cfg.keypoint_threshold,
            nms_radius=cfg.nms_radius,
            border=cfg.border,
            subpixel=cfg.subpixel,
        )

    def match_keypoints(
        self,
        kpts0: Keypoints,
        kpts1: Keypoints,
        image_shape0: Tuple[int, int],
        image_shape1: Tuple[int, int],
        train: bool = False,
    ) -> dict:
        return self.superglue(kpts0, kpts1, image_shape0, image_shape1, train=train)

    def __call__(
        self,
        image0: jax.Array,
        image1: jax.Array,
        kpts0: Optional[Keypoints] = None,
        kpts1: Optional[Keypoints] = None,
        train: bool = False,
    ) -> dict:
        """Full pair matching. Precomputed keypoints skip detection —
        same contract as the reference wrapper (matching.py:54-66)."""
        if kpts0 is None and kpts1 is None and image0.shape == image1.shape:
            # one backbone forward over both images: a 2B-batch conv
            # stack keeps the MXU fuller and halves per-call overheads
            # vs two B-batch programs (per-sample numerics unchanged)
            b = image0.shape[0]
            kp = self.detect(jnp.concatenate([image0, image1], axis=0), train)
            kpts0 = jax.tree_util.tree_map(lambda x: x[:b], kp)
            kpts1 = jax.tree_util.tree_map(lambda x: x[b:], kp)
        if kpts0 is None:
            kpts0 = self.detect(image0, train)
        if kpts1 is None:
            kpts1 = self.detect(image1, train)
        shape0 = (image0.shape[1], image0.shape[2])
        shape1 = (image1.shape[1], image1.shape[2])
        out = self.superglue(kpts0, kpts1, shape0, shape1, train=train)
        out["keypoints0"] = kpts0
        out["keypoints1"] = kpts1
        return out
