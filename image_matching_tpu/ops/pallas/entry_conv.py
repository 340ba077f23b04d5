"""Pallas kernel: the s2d "entry" conv (3x3 SAME conv fused with
space-to-depth) as an explicit im2col matmul.

The s2d backbone starts every level with `conv3x3_s2d_entry`
(ops/s2d_conv.py): a stride-2 4x4 conv taking the direct-layout pooled
map (B, H, W, ci) to the aligned s2d map (B, H/2, W/2, 4co). XLA lowers
that strided window at ~82 TFLOPS on v5e while the in-level 2x2 conv
hits ~242 (ROADMAP perf ledger) — the strided input walk defeats its
tiling. Here the walk is done explicitly: the input is pre-padded once
so output cell (i, j) taps padded rows 2i..2i+3 and cols 2j..2j+3, each
grid step DMAs a (2*bh+2)-row block into VMEM, views each row pair-wise
as (Wp/2, 2ci) — a free row-major reshape — so all 16 (dy, dx) taps are
static sublane slices, concatenates them into a (bh*W/2, 16ci) patch
matrix, and runs ONE MXU matmul against the (16ci, 4co) im2col kernel
(`entry_kernel(w)` reshaped, ops/s2d_conv.py:135-151).

`entry_conv` is the dispatching entry point: Pallas on TPU (custom_vjp,
backward recomputes through the XLA formulation), XLA elsewhere.
Exactness vs `conv3x3_s2d_entry` is locked by
tests/test_pallas_entry_conv.py (interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_matching_tpu.ops.s2d_conv import conv3x3_s2d_entry, entry_kernel


def _kernel(x_hbm, k_ref, out_ref, scratch, sem, *, bh, w_out, ci, co):
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * 2 * bh, 2 * bh + 2)], scratch, sem
    )
    cp.start()
    cp.wait()
    rows = scratch[...]  # (2bh+2, Wp, ci)
    wp = rows.shape[1]
    # pair view: row-major (Wp, ci) == (Wp/2, 2ci); tap col 2j+dx lives at
    # pair row j + dx//2, channel group dx%2
    pairs = rows.reshape(2 * bh + 2, wp // 2, 2 * ci)
    patches = []
    for r in range(bh):
        taps = []
        for dy in range(4):
            row = pairs[2 * r + dy]
            for dx in range(4):
                tap = row[dx // 2:dx // 2 + w_out,
                          (dx % 2) * ci:(dx % 2 + 1) * ci]
                taps.append(tap)
        patches.append(jnp.concatenate(taps, axis=-1))  # (w_out, 16ci)
    patch = jnp.concatenate(patches, axis=0)  # (bh*w_out, 16ci)
    y = jax.lax.dot_general(
        patch, k_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = y.reshape(bh, w_out, 4 * co).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def entry_conv_pallas(
    x: jax.Array, w: jax.Array, block_rows: int = 8, interpret: bool = False
) -> jax.Array:
    """Direct (B, H, W, ci) + (3, 3, ci, co) kernel → aligned s2d
    (B, H/2, W/2, 4co); H/2 % block_rows == 0. Equal to
    conv3x3_s2d_entry(x, w)."""
    b, h, w_in, ci = x.shape
    co = w.shape[3]
    h_out, w_out = h // 2, w_in // 2
    if h_out % block_rows != 0:
        raise ValueError(f"H/2={h_out} not divisible by block_rows={block_rows}")
    # pad so taps are rows 2i..2i+3, cols 2j..2j+3; width padded even so the
    # pair view is a free reshape (right pad 3 -> Wp = W+4, last col unused)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 3), (0, 0)))
    k16 = entry_kernel(w).reshape(16 * ci, 4 * co).astype(x.dtype)
    kernel = functools.partial(
        _kernel, bh=block_rows, w_out=w_out, ci=ci, co=co
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h_out // block_rows),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((16 * ci, 4 * co), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_rows, w_out, 4 * co), lambda bi, i: (bi, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, 4 * co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * block_rows + 2, w_in + 4, ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, k16)


def _dispatch(x: jax.Array, w: jax.Array, interpret: bool) -> jax.Array:
    h_out = x.shape[1] // 2
    for bh in (8, 4, 2, 1):
        if h_out % bh == 0:
            return entry_conv_pallas(x, w, block_rows=bh, interpret=interpret)
    return conv3x3_s2d_entry(x, w)


@jax.custom_vjp
def _entry_conv_grad(x: jax.Array, w: jax.Array) -> jax.Array:
    return _dispatch(x, w, interpret=False)


def _entry_conv_fwd(x, w):
    return _entry_conv_grad(x, w), (x, w)


def _entry_conv_bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(conv3x3_s2d_entry, x, w)
    return vjp(g)


_entry_conv_grad.defvjp(_entry_conv_fwd, _entry_conv_bwd)


def entry_conv(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    """Entry conv: the XLA stride-2 4x4 formulation by default.

    The Pallas im2col kernel (exact in interpret mode, tested) does NOT
    yet compile on real TPU hardware: Mosaic rejects the 16-way tap
    concatenation ("result/input offset mismatch on non-concat
    dimension", hit 2026-08-17 during the learned-pipeline eval). Until
    the tap assembly is rewritten in a Mosaic-lowerable form, hardware
    paths use conv3x3_s2d_entry (~82 TFLOPS on v5e); interpret=True
    keeps exercising the kernel in tests."""
    if interpret:
        return _dispatch(x, w, interpret=True)
    return conv3x3_s2d_entry(x, w)
