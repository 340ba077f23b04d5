"""Shared model building blocks (flax.linen).

Notes on TPU-first choices:
  * params live in f32, compute (conv/matmul) runs in a configurable
    `dtype` — bf16 by default on TPU so the MXU runs at full rate;
    normalisations accumulate in f32.
  * `MaskedBatchNorm1d` replaces torch BatchNorm1d for sequence features:
    the reference operates on variable-length unpadded keypoint lists
    (superglue_test.py:57-61), our fixed-K padded sets need statistics
    over *valid* slots only.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class S2DConv(nn.Module):
    """3x3 (or 1x1) SAME conv whose input/output live in space-to-depth
    layout — parameter-identical to `nn.Conv` (same param names, shapes,
    and, given the same module name, identical initial values), but the
    compute runs as one MXU-saturating 2x2 conv (ops/s2d_conv.py: 242 vs
    39 TFLOPS for the backbone's 64-channel 3x3 layers on v5e).

    Pass `name="Conv_0"` (or the plain variant's conv name) so
    checkpoints trained on either path load into both."""

    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from image_matching_tpu.ops.s2d_conv import conv3x3_s2d

        ci = x.shape[-1] // 4
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, ci, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        if self.kernel == 1:
            b, hh, wh, _ = x.shape
            y = (xd.reshape(b, hh, wh, 4, ci) @ kd[0, 0]).reshape(
                b, hh, wh, 4 * self.features
            )
        else:
            y = conv3x3_s2d(xd, kd)
        return y + jnp.tile(bias, 4).astype(self.dtype)


def bn_s2d(x, bn: nn.Module):
    """Apply a per-channel BatchNorm to an s2d-layout tensor: parity
    groups fold into a spatial dim so params/stats keep shape (C,). In
    training the element set equals the full-res one, so statistics are
    identical to the plain path."""
    b, hh, wh, c4 = x.shape
    c = c4 // 4
    y = bn(x.reshape(b, hh, wh * 4, c))
    return y.reshape(b, hh, wh, c4)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d:
            x = S2DConv(
                self.features, self.kernel, dtype=self.dtype, name="Conv_0"
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="Conv_0",
            )(x)
        # Training: f32 statistics for stable BN. Inference: BN is a pure
        # affine — keep it in the compute dtype so XLA fuses it into the
        # conv epilogue instead of round-tripping f32 tensors through HBM
        # (at 640x480x64 the f32 intermediate alone is ~300 MB/batch).
        bn_dtype = jnp.float32 if train else self.dtype
        bn = nn.BatchNorm(
            use_running_average=not train, dtype=bn_dtype, momentum=0.9,
            name="BatchNorm_0",
        )
        if self.s2d:
            x = bn_s2d(x.astype(bn_dtype), bn)
        else:
            x = bn(x.astype(bn_dtype))
        return nn.relu(x).astype(self.dtype)


class DoubleConv(nn.Module):
    """(conv => BN => ReLU) * 2 — unet_parts.py:10-27."""

    features: int
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.features, dtype=self.dtype, s2d=self.s2d)(x, train)
        x = ConvBNReLU(self.features, dtype=self.dtype, s2d=self.s2d)(x, train)
        return x


def max_pool_stride2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class MaskedBatchNorm1d(nn.Module):
    """BatchNorm over (B, N, C) sequence features with a validity mask.

    Statistics are computed over all valid (b, n) positions, matching what
    torch BatchNorm1d sees on the reference's unpadded lists. Running
    stats live in the `batch_stats` collection like flax BatchNorm.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array], train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        xf = x.astype(jnp.float32)
        if train:
            if mask is None:
                mean = jnp.mean(xf, axis=(0, 1))
                var = jnp.var(xf, axis=(0, 1))
            else:
                w = mask.astype(jnp.float32)[..., None]
                denom = jnp.maximum(jnp.sum(w), 1.0)
                mean = jnp.sum(xf * w, axis=(0, 1)) / denom
                var = jnp.sum(w * (xf - mean) ** 2, axis=(0, 1)) / denom
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


class SeqMLP(nn.Module):
    """1x1-conv MLP over (B, N, C) — the reference's `MLP`
    (superglue_test.py:52-62): Dense + (BN + ReLU) between hidden layers,
    plain Dense at the end."""

    channels: Sequence[int]
    do_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None, train: bool = False):
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, dtype=self.dtype, param_dtype=jnp.float32)(x)
            if i < n - 1:
                if self.do_bn:
                    x = MaskedBatchNorm1d()(x, mask, train)
                x = nn.relu(x)
        return x
