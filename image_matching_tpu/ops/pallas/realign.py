"""Pallas kernel: fused parity realign + 2x2 maxpool for the s2d path.

The s2d backbone's within-level conv emits the *unaligned* tensor U
(B, H+1, W+1, 4C) whose parity group (py, px) holds its value for
output index (i, j) at U[i+py, j+px] (ops/s2d_conv.py). The level-end
maxpool must realign the four groups and reduce — pure data movement +
max, ~200 MB at the first level, which XLA lowers at ~1.2 ms where HBM
bandwidth supports ~0.25 ms (scripts/probe_s2d.py measurements on v5e).

This kernel streams U through VMEM once: each grid step DMAs a
(BH+1, W+1, 4C) row-block, takes the four statically-shifted slices in
VMEM, and writes the (BH, W, C) max. One read of U, one write of the
C-channel result — the realignment costs nothing extra.

Used via `maxpool_realign` which falls back to the XLA formulation when
shapes don't divide (or off-TPU)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(u_hbm, out_ref, scratch, sem, *, bh: int, w: int, c: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        u_hbm.at[b, pl.ds(i * bh, bh + 1)], scratch, sem
    )
    cp.start()
    cp.wait()
    g00 = scratch[0:bh, 0:w, 0 * c:1 * c]
    g01 = scratch[0:bh, 1:w + 1, 1 * c:2 * c]
    g10 = scratch[1:bh + 1, 0:w, 2 * c:3 * c]
    g11 = scratch[1:bh + 1, 1:w + 1, 3 * c:4 * c]
    out_ref[0] = jnp.maximum(jnp.maximum(g00, g01), jnp.maximum(g10, g11))


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def maxpool_realign_pallas(
    u: jax.Array, block_rows: int = 8, interpret: bool = False
) -> jax.Array:
    """U (B, H+1, W+1, 4C) → direct (B, H, W, C); H % block_rows == 0."""
    b, h1, w1, c4 = u.shape
    h, w, c = h1 - 1, w1 - 1, c4 // 4
    if h % block_rows != 0:
        raise ValueError(f"H={h} not divisible by block_rows={block_rows}")
    kernel = functools.partial(_kernel, bh=block_rows, w=w, c=c)
    return pl.pallas_call(
        kernel,
        grid=(b, h // block_rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec(
            (1, block_rows, w, c), lambda bi, i: (bi, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 1, w1, c4), u.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(u)


def _dispatch(u: jax.Array, interpret: bool) -> jax.Array:
    h = u.shape[1] - 1
    for bh in (8, 4, 2):
        if h % bh == 0:
            return maxpool_realign_pallas(u, block_rows=bh, interpret=interpret)
    from image_matching_tpu.ops.s2d_conv import maxpool2x2_s2d_from_raw

    return maxpool2x2_s2d_from_raw(u)


@jax.custom_vjp
def _maxpool_realign_grad(u: jax.Array) -> jax.Array:
    return _dispatch(u, interpret=False)


def _maxpool_realign_fwd(u):
    return _maxpool_realign_grad(u), u


def _maxpool_realign_bwd(u, g):
    from image_matching_tpu.ops.s2d_conv import maxpool2x2_s2d_from_raw

    _, vjp = jax.vjp(maxpool2x2_s2d_from_raw, u)
    return vjp(g)


_maxpool_realign_grad.defvjp(_maxpool_realign_fwd, _maxpool_realign_bwd)


def maxpool_realign(u: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused realign+maxpool with automatic fallback to the XLA slice
    formulation when the row count doesn't block evenly.

    Differentiable: the backward pass routes through the XLA
    formulation's VJP (recompute — the kernel itself is forward-only),
    so this is safe to call from a training graph."""
    if interpret:
        return _dispatch(u, interpret=True)
    return _maxpool_realign_grad(u)


def pool_from_raw(u: jax.Array) -> jax.Array:
    """Realigning pool — currently the XLA slice formulation everywhere.

    The Pallas fused kernel (above, interpret-tested) does NOT yet
    compile on real TPU hardware: Mosaic rejects the shifted in-VMEM
    slices of the odd-width row block ("Slice shape along dimension 2
    must be aligned to tiling (8)", hit 2026-08-17 at the 240x320 eval
    shape). Until the slicing is rewritten tile-aligned, hardware paths
    use maxpool2x2_s2d_from_raw; maxpool_realign(interpret=True) keeps
    the kernel exercised in tests. This is the model call sites' entry
    point — see models/superpoint.py."""
    from image_matching_tpu.ops.s2d_conv import maxpool2x2_s2d_from_raw

    return maxpool2x2_s2d_from_raw(u)
