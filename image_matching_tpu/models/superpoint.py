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

    With `s2d=True`, inference runs the conv stack in space-to-depth
    layout with the layout changes fused into the convs themselves
    (ops/s2d_conv.py v2): each level is one stride-2 "entry" conv
    (direct in → aligned s2d out) + one MXU-saturating 2x2 conv
    (aligned → unaligned U) + a pool that realigns while reducing.
    Mathematically exact (same params & outputs up to dtype rounding;
    checkpoints interchangeable) — the 64-channel full-res convs run
    ~39 → ~200+ TFLOPS. Training always uses the plain path (BN batch
    statistics over U's padding edge would drift). Requires H, W
    divisible by 16."""

    descriptor_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False
    # "h" = H-only (2, 1) space-to-depth (ops/s2d_conv.py v3): 25% fewer
    # machine MACs per 3x3 conv than the (2, 2) layout at the same exact
    # output (measured 1.43x on the level-1 conv, scripts/probe_s2dh.py)
    s2d_layout: str = "h"  # "h" | "2x2"

    @nn.compact
    def __call__(self, image: jax.Array, train: bool = False) -> dict:
        from image_matching_tpu.models.common import (
            ConvParams,
            S2DDoubleConv,
            S2DDoubleConvH,
            fold_parity,
            unfold_parity,
        )
        from image_matching_tpu.ops.pallas.realign import pool_from_raw
        from image_matching_tpu.ops.s2d_conv import (
            conv3x3_s2dh_raw,
            depth_to_space,
            depth_to_space_h,
            maxpool2x2_s2dh_from_raw,
            mm1x1_s2d,
            mm1x1_s2dh,
            realign,
            realign_h,
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

        use_fast = (
            self.s2d and not train
            and image.shape[1] % 16 == 0 and image.shape[2] % 16 == 0
        )
        if use_fast and self.s2d_layout == "h":
            u = S2DDoubleConvH(c1, dtype=self.dtype, name="inc")(x)
            u = S2DDoubleConvH(c2, dtype=self.dtype, name="down1")(
                maxpool2x2_s2dh_from_raw(u)
            )
            u = S2DDoubleConvH(c3, dtype=self.dtype, name="down2")(
                maxpool2x2_s2dh_from_raw(u)
            )
            u = S2DDoubleConvH(c4, dtype=self.dtype, name="down3")(
                maxpool2x2_s2dh_from_raw(u)
            )
            x = realign_h(u)  # alignedH of the Hc x Wc 128-ch map (small)

            def head(conv_name, bn_name, feats, inp):
                k, b_ = ConvParams((3, 3, c4, feats), name=conv_name)()
                y = conv3x3_s2dh_raw(inp, k.astype(self.dtype))
                y = y + jnp.tile(b_, 2).astype(self.dtype)
                y = unfold_parity(bn(bn_name)(fold_parity(y, 2)), y.shape[-1], 2)
                return nn.relu(y)  # Uh-form

            def head_out(conv_name, bn_name, feats, inp):
                k, b_ = ConvParams((1, 1, c5, feats), name=conv_name)()
                y = mm1x1_s2dh(inp, k[0, 0].astype(self.dtype),
                               b_.astype(self.dtype))
                y = unfold_parity(bn(bn_name)(fold_parity(y, 2)), y.shape[-1], 2)
                return depth_to_space_h(realign_h(y).astype(jnp.float32))

            cpa = head("convPa", "bnPa", c5, x)
            semi = head_out("convPb", "bnPb", 65, cpa)
            cda = head("convDa", "bnDa", c5, x)
            desc = head_out("convDb", "bnDb", self.descriptor_dim, cda)
        elif use_fast:
            # pool_from_raw stays on the XLA formulation: the Pallas
            # realign kernel HW-verifies exact but measures slower than
            # XLA's in-model fusion (decision + numbers banked in
            # ops/pallas/realign.py). If it is ever flipped back, feed
            # it 8-aligned stored widths via S2DDoubleConv(extra_cols=
            # (-(W//2+1)) % 8) and pass the true width as out_w.
            u = S2DDoubleConv(c1, dtype=self.dtype, name="inc")(x)
            u = S2DDoubleConv(c2, dtype=self.dtype, name="down1")(
                pool_from_raw(u)
            )
            u = S2DDoubleConv(c3, dtype=self.dtype, name="down2")(
                pool_from_raw(u)
            )
            u = S2DDoubleConv(c4, dtype=self.dtype, name="down3")(
                pool_from_raw(u)
            )
            x = realign(u)  # aligned s2d of the Hc x Wc 128-ch map (small)

            from image_matching_tpu.ops.s2d_conv import conv3x3_s2d_raw

            def head(conv_name, bn_name, feats, inp):
                k, b_ = ConvParams((3, 3, c4, feats), name=conv_name)()
                y = conv3x3_s2d_raw(inp, k.astype(self.dtype))
                y = y + jnp.tile(b_, 4).astype(self.dtype)
                y = unfold_parity(bn(bn_name)(fold_parity(y)), y.shape[-1])
                return nn.relu(y)  # U-form

            def head_out(conv_name, bn_name, feats, inp):
                k, b_ = ConvParams((1, 1, c5, feats), name=conv_name)()
                y = mm1x1_s2d(inp, k[0, 0].astype(self.dtype),
                              b_.astype(self.dtype))
                y = unfold_parity(bn(bn_name)(fold_parity(y)), y.shape[-1])
                return depth_to_space(realign(y).astype(jnp.float32))

            cpa = head("convPa", "bnPa", c5, x)
            semi = head_out("convPb", "bnPb", 65, cpa)
            cda = head("convDa", "bnDa", c5, x)
            desc = head_out("convDb", "bnDb", self.descriptor_dim, cda)
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
    s2d_layout: str = "h"  # "h" | "2x2" — see SuperPointBN

    @nn.compact
    def __call__(self, image: jax.Array, train: bool = False) -> dict:
        del train  # no normalisation layers
        from image_matching_tpu.models.common import ConvParams
        from image_matching_tpu.ops.pallas.entry_conv import entry_conv
        from image_matching_tpu.ops.pallas.realign import pool_from_raw
        from image_matching_tpu.ops.s2d_conv import (
            conv3x3_s2d_raw,
            conv3x3_s2dh_entry,
            conv3x3_s2dh_raw,
            depth_to_space,
            depth_to_space_h,
            maxpool2x2_s2dh_from_raw,
            mm1x1_s2d,
            mm1x1_s2dh,
            realign,
            realign_h,
        )

        c1, c2, c3, c4, c5 = 64, 64, 128, 128, 256
        use_fast = (
            self.s2d
            and image.shape[1] % 16 == 0 and image.shape[2] % 16 == 0
        )
        if use_fast:
            h_layout = self.s2d_layout == "h"
            groups = 2 if h_layout else 4
            entry_fn = conv3x3_s2dh_entry if h_layout else entry_conv
            raw_fn = conv3x3_s2dh_raw if h_layout else conv3x3_s2d_raw
            pool_fn = maxpool2x2_s2dh_from_raw if h_layout else pool_from_raw
            realign_fn = realign_h if h_layout else realign
            mm_fn = mm1x1_s2dh if h_layout else mm1x1_s2d
            d2s_fn = depth_to_space_h if h_layout else depth_to_space

            def conv(ci, co, name, mode):
                k, b = ConvParams((3, 3, ci, co), name=name)()
                fn = entry_fn if mode == "entry" else raw_fn

                def run(x):
                    y = fn(x, k.astype(self.dtype))
                    return nn.relu(y + jnp.tile(b, groups).astype(self.dtype))
                return run

            def conv1x1(ci, co, name):
                k, b = ConvParams((1, 1, ci, co), name=name)()
                return lambda x: mm_fn(
                    x, k[0, 0].astype(self.dtype), b.astype(self.dtype)
                )

            x = image.astype(self.dtype)
            u = conv(c1, c1, "conv1b", "raw")(conv(1, c1, "conv1a", "entry")(x))
            u = conv(c2, c2, "conv2b", "raw")(
                conv(c1, c2, "conv2a", "entry")(pool_fn(u))
            )
            u = conv(c3, c3, "conv3b", "raw")(
                conv(c2, c3, "conv3a", "entry")(pool_fn(u))
            )
            u = conv(c4, c4, "conv4b", "raw")(
                conv(c3, c4, "conv4a", "entry")(pool_fn(u))
            )
            x = realign_fn(u)  # aligned s2d of the Hc x Wc 128-ch map
            cpa = conv(c4, c5, "convPa", "raw")(x)
            semi = d2s_fn(
                realign_fn(conv1x1(c5, 65, "convPb")(cpa)).astype(jnp.float32)
            )
            cda = conv(c4, c5, "convDa", "raw")(x)
            desc = d2s_fn(
                realign_fn(conv1x1(c5, self.descriptor_dim, "convDb")(cda)).astype(
                    jnp.float32
                )
            )
        else:
            conv = lambda f, k, name: nn.Conv(
                f, (k, k), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, name=name,
            )
            x = image.astype(self.dtype)
            x = nn.relu(conv(c1, 3, "conv1a")(x))
            x = nn.relu(conv(c1, 3, "conv1b")(x))
            x = max_pool_stride2(x)
            x = nn.relu(conv(c2, 3, "conv2a")(x))
            x = nn.relu(conv(c2, 3, "conv2b")(x))
            x = max_pool_stride2(x)
            x = nn.relu(conv(c3, 3, "conv3a")(x))
            x = nn.relu(conv(c3, 3, "conv3b")(x))
            x = max_pool_stride2(x)
            x = nn.relu(conv(c4, 3, "conv4a")(x))
            x = nn.relu(conv(c4, 3, "conv4b")(x))

            cpa = nn.relu(conv(c5, 3, "convPa")(x))
            semi = conv(65, 1, "convPb")(cpa).astype(jnp.float32)
            cda = nn.relu(conv(c5, 3, "convDa")(x))
            desc = conv(self.descriptor_dim, 1, "convDb")(cda).astype(jnp.float32)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return {"semi": semi, "desc_map": desc}


def superpoint_postprocess(
    outputs: dict,
    max_keypoints: int,
    threshold: float = 0.005,
    nms_radius: int = 4,
    border: int = 4,
    heatmap: Optional[jax.Array] = None,
    subpixel: bool = False,
) -> Keypoints:
    """Dense net outputs → fixed-K keypoints with sampled descriptors.

    Mirrors superpoint_test.py:128-155: softmax over 65, drop dustbin,
    pixel-shuffle to H×W, simple_nms, threshold+border, top-K, bilinear
    descriptor sampling + L2-normalise — all jitted, batched, static.

    `subpixel=True` additionally refines keypoint coordinates by the
    log-patch soft-argmax the reference applies in its HA-export
    frontend (model_wrap.py:146-176) — off by default (the reference's
    test pipelines use integer NMS coordinates; refinement costs a
    K-point patch gather, fine for eval/registration, skipped on the
    throughput path).
    """
    if heatmap is None:
        # bf16 heatmap: halves the full-res pixel-shuffle + NMS traffic;
        # scores near the detection thresholds keep ~2e-5 resolution.
        # Callers needing f32 (e.g. HA-export aggregation) pass heatmap=.
        heatmap = flatten_detection(outputs["semi"], CELL, dtype=jnp.bfloat16)
    kpts = detect_keypoints(
        heatmap,
        max_keypoints=max_keypoints,
        threshold=threshold,
        nms_radius=nms_radius,
        border=border,
    )
    if subpixel:
        from image_matching_tpu.ops.sampling import refine_keypoints_subpixel

        refined = refine_keypoints_subpixel(
            heatmap.astype(jnp.float32), kpts.xy
        )
        h, w = heatmap.shape[-2:] if heatmap.ndim == 3 else heatmap.shape[1:3]
        refined = jnp.clip(
            refined, 0.0,
            jnp.array([w - 1.0, h - 1.0], refined.dtype),
        )
        kpts = kpts.replace(xy=jnp.where(kpts.mask[..., None], refined, kpts.xy))
    desc = sample_descriptors(kpts.xy, outputs["desc_map"], CELL)
    desc = desc * kpts.mask[..., None].astype(desc.dtype)
    return kpts.replace(desc=desc)
