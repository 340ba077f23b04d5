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


def _kernel(u_hbm, out_lo, out_hi, s_a, s_b, s_c, s_d, sems, *, bh: int,
            w: int, c: int):
    """Spatial (py, px) shifts happen on the DMA side; the channel split
    works on 2C-lane group *pairs* (Mosaic rejects any DMA or slice
    whose lane extent is under/unaligned to 128, so C=64 single-group
    slabs are illegal; bf16 lane rotates are also unimplemented).
    Layout of U's channels is [g00 g01 g10 g11]·C:

      s_a = rows+0, cols+0, ch[0:2c]     g00 in lanes [0:c]
      s_b = rows+0, cols+1, ch[0:2c]     g01 (shifted) in lanes [c:2c]
      s_c = rows+1, cols+0, ch[2c:4c]    g10 in lanes [0:c]
      s_d = rows+1, cols+1, ch[2c:4c]    g11 (shifted) in lanes [c:2c]

    out_lo holds max(g00, g10) in lanes [0:c]; out_hi holds
    max(g01, g11) in lanes [c:2c]; the wrapper takes
    max(out_lo[..:c], out_hi[..c:]) in XLA where sub-128-lane slices
    are legal (a ~10 MB elementwise pass, ≪ the DMA win)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * bh
    cps = [
        pltpu.make_async_copy(
            u_hbm.at[b, pl.ds(r0 + py, bh), pl.ds(px, w),
                     pl.ds(py * 2 * c, 2 * c)],
            dst, sems.at[py * 2 + px],
        )
        for (py, px), dst in zip(
            [(0, 0), (0, 1), (1, 0), (1, 1)], [s_a, s_b, s_c, s_d]
        )
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()
    out_lo[0] = jnp.maximum(s_a[...], s_c[...])
    out_hi[0] = jnp.maximum(s_b[...], s_d[...])


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
    out = pl.pallas_call(
        kernel,
        grid=(b, h // block_rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=[
            pl.BlockSpec((1, block_rows, w, 2 * c),
                         lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, block_rows, w, 2 * c),
                         lambda bi, i: (bi, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, 2 * c), u.dtype),
            jax.ShapeDtypeStruct((b, h, w, 2 * c), u.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_rows, w, 2 * c), u.dtype),
            pltpu.VMEM((block_rows, w, 2 * c), u.dtype),
            pltpu.VMEM((block_rows, w, 2 * c), u.dtype),
            pltpu.VMEM((block_rows, w, 2 * c), u.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(u)
    lo, hi = out
    return jnp.maximum(lo[..., :c], hi[..., c:])


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

    The Pallas kernel (above, interpret-tested, exact) does NOT yet
    compile on real TPU hardware. Empirically mapped Mosaic constraints
    (v5e, 2026-08-18), each hit in turn while reformulating:
      1. in-VMEM shifted slices: slice shapes/offsets in the sublane
         dim must be multiples of 8 (odd W+1 row blocks fail);
      2. DMA lane slabs must be ≥128 lanes and 128-aligned (a C=64
         parity-group slab is illegal even HBM→VMEM);
      3. bf16 lane rotate is unimplemented ("Rotate with non-32-bit
         data"), so group pairs can't be realigned in-register;
      4. DMA *source offsets* in the sublane dim must be provably
         8-divisible — the ±1-pixel parity shift itself is the blocker.
    The current kernel form (2C-lane pair slabs, shifts on the DMA,
    two partial outputs max-combined in XLA) clears 1-3 and stops at 4;
    fixing it needs either a Mosaic-side relaxation or an algebra change
    that keeps U's parity groups 8-aligned. XLA's fused 4-slice max
    costs 0.91 ms at the bench shape (profiler) — reformulations tried
    in scripts-era probes (row-first, group-dim reshape) measured
    SLOWER, so XLA remains the hardware path.
    maxpool_realign(interpret=True) keeps the kernel exercised in
    tests. This is the model call sites' entry point — see
    models/superpoint.py."""
    from image_matching_tpu.ops.s2d_conv import maxpool2x2_s2d_from_raw

    return maxpool2x2_s2d_from_raw(u)
