"""SuperPoint detector+descriptor networks (flax.linen, NHWC, bf16-ready).

Two variants, matching the reference's two backbones:
  * `SuperPointBN` — the U-Net-encoder training variant with BatchNorm
    (superpoint/models/superpoint_train.py:8-58 over unet_parts.py):
    inconv(64) + 3×(maxpool + double_conv) with channels 64-64-128-128,
    then BN'd detector (65ch) and descriptor heads through a 256ch 3×3.
  * `SuperPointVGG` — the MagicLeap official plain-VGG variant without BN
    (superglue/models/superpoint.py:95-202), fixed 256-d descriptors.

Both emit a dict {"semi": (B, Hc, Wc, 65) logits,
"desc_map": (B, Hc, Wc, D) L2-normalised coarse descriptors}; the shared
`superpoint_postprocess` turns that into a fixed-K masked `Keypoints` via
softmax→pixel-shuffle→NMS→top-k→bilinear descriptor sampling — the whole
chain the reference runs half on device, half on host
(superpoint_test.py:103-161), here one fused XLA program.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from image_matching_tpu.geometry.labels import flatten_detection
from image_matching_tpu.models.common import DoubleConv, max_pool_stride2
from image_matching_tpu.ops.detect import detect_keypoints
from image_matching_tpu.ops.sampling import sample_descriptors
from image_matching_tpu.structs import Keypoints

CELL = 8


class SuperPointBN(nn.Module):
    """U-Net-encoder SuperPoint with BatchNorm (training variant).

    With `s2d=True` the whole network runs in space-to-depth layout
    (ops/s2d_conv.py): every 3x3 conv becomes one MXU-saturating 2x2
    conv and every maxpool a channel-group max. Mathematically exact
    (same params, same outputs up to dtype rounding; checkpoints are
    interchangeable between the two paths) but ~3x faster on the hot
    64-channel full-resolution layers on TPU. Requires H, W divisible
    by 16."""

    descriptor_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, image: jax.Array, train: bool = False) -> dict:
        from image_matching_tpu.models.common import S2DConv, bn_s2d
        from image_matching_tpu.ops.s2d_conv import (
            depth_to_space,
            maxpool2x2_s2d,
            space_to_depth,
        )

        c1, c2, c3, c4, c5 = 64, 64, 128, 128, 256
        x = image.astype(self.dtype)
        bn_dtype = jnp.float32 if train else self.dtype
        # f32 BN statistics in training; fused bf16 affine at inference
        # (see ConvBNReLU) — heads run at Hc x Wc so this matters less
        # than the backbone, but keep the policy uniform
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=bn_dtype,
            momentum=0.9, name=name,
        )

        if self.s2d:
            x = space_to_depth(x)
            x = DoubleConv(c1, dtype=self.dtype, s2d=True, name="inc")(x, train)
            for c, name in ((c2, "down1"), (c3, "down2"), (c4, "down3")):
                x = space_to_depth(maxpool2x2_s2d(x))
                x = DoubleConv(c, dtype=self.dtype, s2d=True, name=name)(x, train)

            conv = lambda f, k, name: S2DConv(
                f, k, dtype=self.dtype, name=name
            )
            bnw = lambda name, t: bn_s2d(t.astype(bn_dtype), bn(name))
            cpa = nn.relu(bnw("bnPa", conv(c5, 3, "convPa")(x)))
            semi = bnw("bnPb", conv(65, 1, "convPb")(cpa.astype(self.dtype)))
            semi = depth_to_space(semi.astype(jnp.float32))
            cda = nn.relu(bnw("bnDa", conv(c5, 3, "convDa")(x)))
            desc = bnw(
                "bnDb", conv(self.descriptor_dim, 1, "convDb")(cda.astype(self.dtype))
            )
            desc = depth_to_space(desc.astype(jnp.float32))
        else:
            x = DoubleConv(c1, dtype=self.dtype, name="inc")(x, train)
            x = DoubleConv(c2, dtype=self.dtype, name="down1")(max_pool_stride2(x), train)
            x = DoubleConv(c3, dtype=self.dtype, name="down2")(max_pool_stride2(x), train)
            x = DoubleConv(c4, dtype=self.dtype, name="down3")(max_pool_stride2(x), train)

            conv = lambda f, k, name: nn.Conv(
                f, (k, k), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, name=name,
            )
            cpa = nn.relu(bn("bnPa")(conv(c5, 3, "convPa")(x).astype(bn_dtype)))
            semi = bn("bnPb")(
                conv(65, 1, "convPb")(cpa.astype(self.dtype)).astype(bn_dtype)
            ).astype(jnp.float32)
            cda = nn.relu(bn("bnDa")(conv(c5, 3, "convDa")(x).astype(bn_dtype)))
            desc = bn("bnDb")(
                conv(self.descriptor_dim, 1, "convDb")(cda.astype(self.dtype)).astype(bn_dtype)
            ).astype(jnp.float32)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return {"semi": semi, "desc_map": desc}


class SuperPointVGG(nn.Module):
    """Plain VGG SuperPoint (MagicLeap official architecture, no BN).

    `s2d=True` runs the exact same network in space-to-depth layout —
    see SuperPointBN."""

    descriptor_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, image: jax.Array, train: bool = False) -> dict:
        del train  # no normalisation layers
        from image_matching_tpu.models.common import S2DConv
        from image_matching_tpu.ops.s2d_conv import (
            depth_to_space,
            maxpool2x2_s2d,
            space_to_depth,
        )

        c1, c2, c3, c4, c5 = 64, 64, 128, 128, 256
        if self.s2d:
            conv = lambda f, k, name: S2DConv(f, k, dtype=self.dtype, name=name)
            pool = lambda x: space_to_depth(maxpool2x2_s2d(x))
            x = space_to_depth(image.astype(self.dtype))
        else:
            conv = lambda f, k, name: nn.Conv(
                f, (k, k), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, name=name,
            )
            pool = max_pool_stride2
            x = image.astype(self.dtype)
        x = nn.relu(conv(c1, 3, "conv1a")(x))
        x = nn.relu(conv(c1, 3, "conv1b")(x))
        x = pool(x)
        x = nn.relu(conv(c2, 3, "conv2a")(x))
        x = nn.relu(conv(c2, 3, "conv2b")(x))
        x = pool(x)
        x = nn.relu(conv(c3, 3, "conv3a")(x))
        x = nn.relu(conv(c3, 3, "conv3b")(x))
        x = pool(x)
        x = nn.relu(conv(c4, 3, "conv4a")(x))
        x = nn.relu(conv(c4, 3, "conv4b")(x))

        cpa = nn.relu(conv(c5, 3, "convPa")(x))
        semi = conv(65, 1, "convPb")(cpa).astype(jnp.float32)
        cda = nn.relu(conv(c5, 3, "convDa")(x))
        desc = conv(self.descriptor_dim, 1, "convDb")(cda).astype(jnp.float32)
        if self.s2d:
            semi = depth_to_space(semi)
            desc = depth_to_space(desc)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return {"semi": semi, "desc_map": desc}


def superpoint_postprocess(
    outputs: dict,
    max_keypoints: int,
    threshold: float = 0.005,
    nms_radius: int = 4,
    border: int = 4,
    heatmap: Optional[jax.Array] = None,
) -> Keypoints:
    """Dense net outputs → fixed-K keypoints with sampled descriptors.

    Mirrors superpoint_test.py:128-155: softmax over 65, drop dustbin,
    pixel-shuffle to H×W, simple_nms, threshold+border, top-K, bilinear
    descriptor sampling + L2-normalise — all jitted, batched, static.
    """
    if heatmap is None:
        heatmap = flatten_detection(outputs["semi"], CELL)
    kpts = detect_keypoints(
        heatmap,
        max_keypoints=max_keypoints,
        threshold=threshold,
        nms_radius=nms_radius,
        border=border,
    )
    desc = sample_descriptors(kpts.xy, outputs["desc_map"], CELL)
    desc = desc * kpts.mask[..., None].astype(desc.dtype)
    return kpts.replace(desc=desc)
