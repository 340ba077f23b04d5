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


class ConvParams(nn.Module):
    """Parameter shim: declares `kernel`/`bias` exactly like `nn.Conv`
    (same names, shapes, init distribution — and, given the same module
    name, identical init values) but returns them for custom compute.
    Used by the s2d fast paths so checkpoints are interchangeable with
    the plain conv path."""

    shape: tuple
    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32
        )
        return kernel, bias


class DenseParams(nn.Module):
    """Parameter shim: declares `kernel`/`bias` exactly like `nn.Dense`
    (same names, shapes, init — checkpoints interchangeable) but returns
    the arrays for custom fused compute, e.g. one concatenated Q/K/V
    matmul in MultiHeadedAttention."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class BNParams(nn.Module):
    """Parameter shim: declares scale/bias params and mean/var running
    stats exactly like `nn.BatchNorm` (same names, shapes, inits — and,
    given the same module name, checkpoint-interchangeable) but returns
    the arrays so inference fast paths can fold the affine into a fused
    kernel epilogue (ops/pallas/entry_h.py)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        return scale, bias, mean.value, var.value


def fold_parity(x, groups: int = 4):
    """View an s2d/U tensor (..., W', G*C) as (..., W'*G, C) so
    per-channel ops (BatchNorm) see shape-(C,) features. G = 4 for the
    (2, 2) layout, 2 for the H-only (2, 1) layout."""
    *lead, wh, cg = x.shape
    return x.reshape(*lead, wh * groups, cg // groups)


def unfold_parity(x, cg, groups: int = 4):
    *lead, wg, c = x.shape
    return x.reshape(*lead, wg // groups, cg)


class S2DConvBNReLU(nn.Module):
    """conv+BN+ReLU computed in s2d layout — parameter-compatible with
    `ConvBNReLU` (Conv_0/BatchNorm_0 children). `mode` selects the conv:
    "entry" consumes a direct-layout map via the fused stride-2 4x4 conv
    (ops/s2d_conv.py: conv3x3_s2d_entry) and emits aligned s2d; "raw"
    consumes aligned s2d and emits the unaligned U tensor (realignment
    deferred to the consumer). Inference-only (running BN stats)."""

    features: int
    mode: str  # "entry" | "raw"
    dtype: jnp.dtype = jnp.float32
    # junk columns appended to the raw conv's U output so the Pallas
    # realign pool's DMA can tile it (ops/pallas/realign.py); the true
    # width travels as the pool's out_w
    extra_cols: int = 0

    @nn.compact
    def __call__(self, x):
        from image_matching_tpu.ops.pallas.entry_conv import entry_conv
        from image_matching_tpu.ops.s2d_conv import conv3x3_s2d_raw

        ci = x.shape[-1] if self.mode == "entry" else x.shape[-1] // 4
        kernel, bias = ConvParams((3, 3, ci, self.features), name="Conv_0")()
        kd = kernel.astype(self.dtype)
        xd = x.astype(self.dtype)
        if self.mode == "entry":
            y = entry_conv(xd, kd)
        else:
            y = conv3x3_s2d_raw(xd, kd, extra_cols=self.extra_cols)
        y = y + jnp.tile(bias, 4).astype(self.dtype)
        bn = nn.BatchNorm(
            use_running_average=True, dtype=self.dtype, momentum=0.9,
            name="BatchNorm_0",
        )
        y = unfold_parity(bn(fold_parity(y)), y.shape[-1])
        return nn.relu(y).astype(self.dtype)


class S2DDoubleConv(nn.Module):
    """DoubleConv twin for the s2d fast path: entry conv then raw conv.
    Direct map in → U out (pool or realign downstream)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    extra_cols: int = 0  # see S2DConvBNReLU

    @nn.compact
    def __call__(self, x):
        x = S2DConvBNReLU(self.features, "entry", dtype=self.dtype,
                          name="ConvBNReLU_0")(x)
        return S2DConvBNReLU(self.features, "raw", dtype=self.dtype,
                             extra_cols=self.extra_cols,
                             name="ConvBNReLU_1")(x)


class S2DConvBNReLUH(nn.Module):
    """conv+BN+ReLU in the H-only (2, 1) s2d layout (ops/s2d_conv.py v3)
    — parameter-compatible with `ConvBNReLU` (Conv_0/BatchNorm_0
    children). "entry" consumes a direct map via the fused stride-(2,1)
    4x3 conv and emits alignedH; "raw" consumes alignedH and emits the
    unaligned Uh (row-realignment deferred to the consumer).
    Inference-only (running BN stats)."""

    features: int
    mode: str  # "entry" | "raw"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Inference-only contract: BatchNorm uses running statistics. A
        # training caller must use ConvBNReLU (the plain path) instead —
        # batch statistics over the Uh padding edge would drift.
        if train:
            raise ValueError(
                "S2DConvBNReLUH is inference-only (running BN stats); "
                "use ConvBNReLU for training"
            )
        from image_matching_tpu.ops.s2d_conv import (
            conv3x3_s2dh_entry,
            conv3x3_s2dh_raw,
        )

        ci = x.shape[-1] if self.mode == "entry" else x.shape[-1] // 2
        kernel, bias = ConvParams((3, 3, ci, self.features), name="Conv_0")()
        kd = kernel.astype(self.dtype)
        xd = x.astype(self.dtype)
        if (
            self.mode == "entry" and ci == 1
            and self.dtype == jnp.bfloat16
        ):
            # image entry conv: one fused Pallas pass (conv + bias + BN
            # + ReLU folded into a per-channel affine epilogue) — the op
            # is output-write-bound, so the unfused chain's extra HBM
            # round-trips dominate its cost (ops/pallas/entry_h.py)
            from image_matching_tpu.ops.pallas.entry_h import entry_h_fused

            g, b2, mu, var = BNParams(self.features, name="BatchNorm_0")()
            inv = g * jax.lax.rsqrt(var + 1e-5)
            return entry_h_fused(
                xd[..., 0], kernel,
                jnp.tile(inv, 2),
                jnp.tile((bias - mu) * inv + b2, 2),
            )
        if self.mode == "entry":
            y = conv3x3_s2dh_entry(xd, kd)
        else:
            y = conv3x3_s2dh_raw(xd, kd)
        y = y + jnp.tile(bias, 2).astype(self.dtype)
        bn = nn.BatchNorm(
            use_running_average=True, dtype=self.dtype, momentum=0.9,
            name="BatchNorm_0",
        )
        y = unfold_parity(bn(fold_parity(y, 2)), y.shape[-1], 2)
        return nn.relu(y).astype(self.dtype)


class S2DDoubleConvH(nn.Module):
    """DoubleConv twin for the H-s2d fast path: entry conv then raw
    conv. Direct map in → Uh out (pool or realign downstream)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = S2DConvBNReLUH(self.features, "entry", dtype=self.dtype,
                           name="ConvBNReLU_0")(x)
        return S2DConvBNReLUH(self.features, "raw", dtype=self.dtype,
                              name="ConvBNReLU_1")(x)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
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
        x = nn.BatchNorm(
            use_running_average=not train, dtype=bn_dtype, momentum=0.9,
            name="BatchNorm_0",
        )(x.astype(bn_dtype))
        return nn.relu(x).astype(self.dtype)


class DoubleConv(nn.Module):
    """(conv => BN => ReLU) * 2 — unet_parts.py:10-27."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.features, dtype=self.dtype)(x, train)
        x = ConvBNReLU(self.features, dtype=self.dtype)(x, train)
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
    def __call__(
        self,
        x,
        mask: Optional[jax.Array] = None,
        train: bool = False,
        x2: Optional[jax.Array] = None,
        x2_fold=None,
    ):
        """`x2`: optional second input, treated as if concatenated onto
        `x` along the channel axis — the first Dense splits its kernel
        (x @ W[:c] + x2 @ W[c:]) instead of materialising the concat
        (8 MB/GNN-layer-side of pure HBM traffic at the headline shape).
        Parameter shapes are identical to passing concatenate([x, x2]) as
        `x`; outputs are identical up to dtype rounding (the two partial
        matmuls are each rounded to the compute dtype before the add).
        `x2_fold=(W, b)`: treat `x2` as (x2 @ W + b), folding that
        projection into the x2 half of the kernel (see _SplitDense)."""
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            if i == 0 and x2 is not None:
                x = _SplitDense(ch, dtype=self.dtype, name="Dense_0")(
                    x, x2, x2_fold
                )
            else:
                x = nn.Dense(ch, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"Dense_{i}")(x)
            if i < n - 1:
                if self.do_bn:
                    x = MaskedBatchNorm1d()(x, mask, train)
                x = nn.relu(x)
        return x


class _SplitDense(nn.Module):
    """nn.Dense over an implicit concat([x, x2], -1) without forming the
    concat: same param names/shapes ("kernel" (c1+c2, ch), "bias") so
    checkpoints are interchangeable with a plain Dense. Outputs equal the
    fused single matmul up to dtype rounding (each partial matmul is
    rounded to the compute dtype before the add; exact in float32).

    `x2_fold=(W, b)`: the caller's `x2` is a *pre-projection* tensor whose
    projection x2 @ W + b it wants folded in: the x2 half of the kernel
    becomes W @ kernel[c1:] (computed once in f32) and b @ kernel[c1:]
    joins the bias — one fewer full-size matmul, equal up to dtype
    rounding (reassociation)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x2, x2_fold=None):
        c1 = x.shape[-1]
        c2 = x2_fold[0].shape[0] if x2_fold is not None else x2.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (c1 + c2, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        k = kernel.astype(self.dtype)
        if x2_fold is not None:
            w, b = x2_fold
            k2 = (w.astype(jnp.float32) @ kernel[c1:]).astype(self.dtype)
            bias = bias + b.astype(jnp.float32) @ kernel[c1:]
            y = x.astype(self.dtype) @ k[:c1] + x2.astype(self.dtype) @ k2
        else:
            y = x.astype(self.dtype) @ k[:c1] + x2.astype(self.dtype) @ k[c1:]
        return y + bias.astype(self.dtype)
