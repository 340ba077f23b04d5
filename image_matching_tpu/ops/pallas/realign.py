"""Pallas kernel: fused parity realign + 2x2 maxpool for the s2d path.

The s2d backbone's within-level conv emits the *unaligned* tensor U
(B, H+1, W+1, 4C) whose parity group (py, px) holds its value for
output index (i, j) at U[i+py, j+px] (ops/s2d_conv.py). The level-end
maxpool must realign the four groups and reduce — pure data movement +
max, ~200 MB at the first level, which XLA lowers at ~0.91 ms where HBM
bandwidth supports ~0.4 ms (scripts/probe_s2d.py / ROADMAP ledger).

Kernel shape (v2, lowers on v5e hardware — see history below): each
grid step DMAs one whole (bh+1)-row slab of U into VMEM and

  a  = S[0:bh,   0:w,   0:2C]   (g00 | g01-unshifted)
  b  = S[0:bh,   1:w+1, 0:2C]   (g01 aligned into lanes [C:2C])
  c_ = S[1:bh+1, 0:w,   2C:4C]  (g10 | g11-unshifted)
  d  = S[1:bh+1, 1:w+1, 2C:4C]  (g11 aligned into lanes [C:2C])
  lo = max(a, c_)   # lanes [0:C] = max(g00, g10), rest junk
  hi = max(b, d)    # lanes [C:2C] = max(g01, g11), rest junk
  out = max(lo, lane_roll(hi, C))  # lanes [0:C] = the pooled result

The row (+1) shift is an outer-dim VMEM slice; the column (+1) shift is
a *sublane* slice at offset 1; the cross-pair combine is an f32 lane
roll. All three were verified to lower and produce exact values on v5e
(scripts/probe_mosaic_roll.py) — the round-2 blocker list
(shifted-slice 8-alignment, "DMA source sublane offsets must be
8-divisible") turned out to apply to bf16 *rotates* and the then-used
4-DMA formulation, not to f32 rolls or to in-VMEM shifted slices. One
HBM read of U (+1 row of overlap per block), one (B, H, W, 2C) write;
the wrapper's final [..., :C] slice runs in XLA where sub-128-lane
output layouts are legal.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(u_hbm, out_ref, s_u, sems, *, bh: int, w: int, c: int, nb: int):
    b = pl.program_id(0)
    i = pl.program_id(1)

    def cp(blk, slot):
        return pltpu.make_async_copy(
            u_hbm.at[b, pl.ds(blk * bh, bh + 1)], s_u.at[slot], sems.at[slot]
        )

    # double-buffered DMA: prefetch block i+1 while computing block i
    @pl.when(i == 0)
    def _():
        cp(i, i % 2).start()

    @pl.when(i + 1 < nb)
    def _():
        cp(i + 1, (i + 1) % 2).start()

    cp(i, i % 2).wait()
    s = s_u.at[i % 2]
    a = s[0:bh, 0:w, 0:2 * c]
    b_ = s[0:bh, 1:w + 1, 0:2 * c]
    c_ = s[1:bh + 1, 0:w, 2 * c:4 * c]
    d = s[1:bh + 1, 1:w + 1, 2 * c:4 * c]
    lo = jnp.maximum(a, c_).astype(jnp.float32)
    hi = jnp.maximum(b_, d).astype(jnp.float32)
    # bring hi's aligned lanes [C:2C] onto [0:C] (f32 roll — bf16 lane
    # rotates are unimplemented in Mosaic) and reduce
    out = jnp.maximum(lo, pltpu.roll(hi, c, axis=2))
    out_ref[0] = out[:, :, 0:c].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_w", "block_rows", "interpret")
)
def maxpool_realign_pallas(
    u: jax.Array,
    out_w: int | None = None,
    block_rows: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """U (B, H+1, ≥W+1, 4C) → direct (B, H, W, C); H % block_rows == 0.

    On hardware the DMA requires u.shape[2] % 8 == 0 — produce U with
    conv3x3_s2d_raw(..., extra_cols) and pass the true width as out_w."""
    b, h1, w1, c4 = u.shape
    h, c = h1 - 1, c4 // 4
    w = out_w if out_w is not None else w1 - 1
    if h % block_rows != 0:
        raise ValueError(f"H={h} not divisible by block_rows={block_rows}")
    nb = h // block_rows
    kernel = functools.partial(_kernel, bh=block_rows, w=w, c=c, nb=nb)
    return pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec(
            (1, block_rows, w, c), lambda bi, i: (bi, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows + 1, w1, c4), u.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(u)


def _dispatch(u: jax.Array, out_w, interpret: bool) -> jax.Array:
    h = u.shape[1] - 1
    # hardware DMA needs the stored width 8-aligned (Mosaic sublane
    # tiling); interpret mode has no such constraint
    w_ok = interpret or u.shape[2] % 8 == 0
    if w_ok:
        for bh in (8, 4, 2):
            if h % bh == 0:
                return maxpool_realign_pallas(
                    u, out_w=out_w, block_rows=bh, interpret=interpret
                )
    from image_matching_tpu.ops.s2d_conv import maxpool2x2_s2d_from_raw

    return maxpool2x2_s2d_from_raw(u, out_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _maxpool_realign_grad(u: jax.Array, out_w) -> jax.Array:
    return _dispatch(u, out_w, interpret=False)


def _maxpool_realign_fwd(u, out_w):
    return _maxpool_realign_grad(u, out_w), u


def _maxpool_realign_bwd(out_w, u, g):
    from image_matching_tpu.ops.s2d_conv import maxpool2x2_s2d_from_raw

    _, vjp = jax.vjp(lambda x: maxpool2x2_s2d_from_raw(x, out_w), u)
    return vjp(g)


_maxpool_realign_grad.defvjp(_maxpool_realign_fwd, _maxpool_realign_bwd)


def maxpool_realign(
    u: jax.Array, out_w: int | None = None, interpret: bool = False
) -> jax.Array:
    """Fused realign+maxpool with automatic fallback to the XLA slice
    formulation when the shape doesn't block (row count, or a stored
    width the DMA can't tile).

    Differentiable: the backward pass routes through the XLA
    formulation's VJP (recompute — the kernel itself is forward-only),
    so this is safe to call from a training graph."""
    if interpret:
        return _dispatch(u, out_w, interpret=True)
    return _maxpool_realign_grad(u, out_w)


def pool_from_raw(u: jax.Array, out_w: int | None = None) -> jax.Array:
    """Realigning pool — the model call sites' entry point
    (models/superpoint.py). Stays on the XLA slice formulation: DECISION
    BANKED (round 3, v5e, scripts/probe_realign_hw.py). The Pallas
    kernel above now compiles AND runs exact on hardware — every
    round-2 Mosaic blocker fell once the formulation used one
    whole-slab DMA, in-VMEM offset-1 sublane slices, and an f32 lane
    roll (probe_mosaic_roll.py: those all lower; only bf16 rotates
    don't). But it measures SLOWER than XLA at the bench shapes:

        U(8,240,320,64): kernel 2.01 ms (double-buffered, narrow out)
                         vs 1.91 ms standalone XLA, 0.91 ms in-model
        U(8,120,160,64): 0.23 vs 0.20 ms
        U(8, 60, 80,128): 0.074 vs 0.077 ms

    Variants measured: single-buffer 2.28, +narrow output 2.21,
    +double-buffer 2.01, no-roll bf16 two-output 2.51. The kernel is
    VPU-bound on the unaligned-slice shifts, and in-model XLA fuses the
    realign into neighbouring ops for free — a standalone kernel cannot
    beat a fused 0.91 ms. Kept (tested, HW-verified) as the starting
    point if a future Mosaic improves unaligned-slice lowering."""
    from image_matching_tpu.ops.s2d_conv import maxpool2x2_s2d_from_raw

    return maxpool2x2_s2d_from_raw(u, out_w)
