"""Pallas kernel: the H-s2d image entry conv, fused with its epilogue.

The backbone's first op is a 3x3 SAME conv over the 1-channel image
emitted straight into the H-only space-to-depth layout
(ops/s2d_conv.py `conv3x3_s2dh_entry`), followed by bias + inference
BatchNorm + ReLU (models/common.py `S2DConvBNReLUH`). The op is almost
pure output bandwidth — the image is ~10 MB while the (B, H/2, W, 2co)
bf16 output is ~315 MB at the headline shape — yet the XLA chain costs
~1.5 ms where the write floor is ~0.4 ms: the tap-as-channels matmul
form pays a 29 MB patch transpose (0.47 ms) plus a conv that reads the
patches back (0.96 ms), and the bias/BN/ReLU ride along (profiler
ledger, scripts/profile_headline.py).

Here everything happens in one pass over VMEM-resident image rows:

  * the padded image is pre-split into even/odd row planes in XLA (a
    ~20 MB relayout of the small input) so the kernel's 4 row taps are
    unit-stride sublane reads — no strided sublane access;
  * the 3 column taps are f32 lane rolls (bf16 lane rotates don't
    lower in Mosaic; f32 rolls verified on v5e,
    scripts/probe_mosaic_roll.py) followed by lane-aligned slices;
  * the 12 taps contract against the (12, 2co) im2col kernel
    (`entry_kernel_h`) in ONE MXU matmul per row block;
  * the inference epilogue y = relu(acc * scale + shift) is applied to
    the f32 accumulator in registers — conv bias and BatchNorm fold
    into the per-channel (scale, shift) pair, so no separate
    elementwise pass ever touches the 315 MB tensor.

Forward-only by design: the consuming module (S2DConvBNReLUH) is an
inference-only fast path that raises under training, so no custom_vjp
is wired. Exactness vs the XLA composition is locked by
tests/test_pallas_entry_h.py (interpret mode) and the in-model parity
tests; values differ from the unfused chain only by bf16 rounding
(the fused epilogue rounds once, the reference chain after every op).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_matching_tpu.ops.s2d_conv import entry_kernel_h


def _kernel(xe_hbm, xo_hbm, k_ref, scale_ref, shift_ref, out_ref,
            s_e, s_o, sems, *, r, w, nb, variant):
    b = pl.program_id(0)
    i = pl.program_id(1)

    def cps(blk, slot):
        # slabs over-fetch to r + 8 rows: Mosaic's DMA lowering crashes
        # on sublane sizes that aren't multiples of 8 (r + 1 rows hit
        # "tpu_compile_helper subprocess exit code 1"; 24/32-row slabs
        # verified on v5e) — the extra rows are junk padding
        return (
            pltpu.make_async_copy(
                xe_hbm.at[b, pl.ds(blk * r, r + 8)], s_e.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                xo_hbm.at[b, pl.ds(blk * r, r + 8)], s_o.at[slot],
                sems.at[slot, 1],
            ),
        )

    # double-buffered input DMA: prefetch block i+1 while computing i
    @pl.when(i == 0)
    def _():
        for c in cps(i, i % 2):
            c.start()

    @pl.when(i + 1 < nb)
    def _():
        for c in cps(i + 1, (i + 1) % 2):
            c.start()

    for c in cps(i, i % 2):
        c.wait()
    xe = s_e[i % 2].astype(jnp.float32)  # (r+1, Wp)
    xo = s_o[i % 2].astype(jnp.float32)
    taps = []
    for u in range(4):  # output row i taps padded rows 2i + u
        base = (xe if u % 2 == 0 else xo)[u // 2:u // 2 + r, :]
        for kx in range(3):  # column taps: lane roll + aligned slice
            # circular left-shift by kx (pltpu.roll requires shift >= 0)
            t = base if kx == 0 else pltpu.roll(
                base, base.shape[1] - kx, axis=1
            )
            taps.append(t[:, :w])  # (r, w)
    kmat = k_ref[...].astype(jnp.float32)  # (16, 2co), rows 12.. zero
    if variant == "stack_minor":
        p = jnp.stack(taps, axis=-1)  # (r, w, 12)
        acc = jax.lax.dot_general(
            p.reshape(r * w, 12), kmat[:12],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (r*w, 2co)
    else:  # "stack_major"
        t3 = jnp.stack(taps, axis=0)  # (12, r, w)
        acc = jax.lax.dot_general(
            t3, kmat[:12], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(r * w, -1)  # (r, w, 2co) -> (r*w, 2co)
    y = jnp.maximum(acc * scale_ref[...] + shift_ref[...], 0.0)
    y = y.astype(out_ref.dtype).reshape(r, w, -1)
    if len(out_ref.shape) == 4:  # "bhwc" block (1, r, w, 2co)
        out_ref[0] = y
    else:  # "hwbc" block (r, w, 2co)
        out_ref[...] = y


@functools.partial(
    jax.jit,
    static_argnames=("block_rows", "variant", "interpret"),
)
def entry_h_fused_pallas(
    img: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    block_rows: int = 16,
    # "stack_major" is the hardware default: Mosaic crashes lowering the
    # 12-way minor-axis tap stack ("stack_minor" — same blocker class as
    # the v2 entry kernel's 16-way lane concat, ops/pallas/entry_conv.py)
    # but lowers the major-axis stack + dim-0 contraction fine (v5e,
    # 2026-08-20). "stack_minor" remains exercised in interpret tests.
    variant: str = "stack_major",
    # physical output arrangement. "hwbc"/"hwbc_raw" store
    # (H/2, W, B*2co) — bit-identical bytes to XLA's conv-preferred
    # {3,0,2,1} layout of the logical NHWC result (batch fills the 8
    # sublanes, channels the 128 lanes). "hwbc" transposes back to
    # logical NHWC (measured: XLA materialises that as a 0.96 ms copy —
    # NOT free); "hwbc_raw" returns the raw array for consumers that
    # read it directly (HWNC-labelled conv, scripts/probe_entry_chain
    # .py); "bhwc" is plain row-major NHWC (the conv then pays a
    # +0.42 ms input relayout inside its fusion).
    out_layout: str = "bhwc",
    interpret: bool = False,
) -> jax.Array:
    """img (B, H, W) + w (3, 3, 1, co) + per-channel (2co,) f32 affine →
    relu(scale * conv3x3_s2dh_entry(img) + shift) as alignedH
    (B, H/2, W, 2co) bf16. Requires H/2 % block_rows == 0, W % 128 == 0.
    """
    b, h, wd = img.shape
    co = w.shape[3]
    h2 = h // 2
    if h2 % block_rows != 0 or wd % 128 != 0:
        raise ValueError(f"shape ({h}, {wd}) does not block")
    # pad rows (1, 2) cols (1, 127): taps for output row i live at padded
    # rows 2i..2i+3, cols kx..kx+W-1 (kx in 0..2); lane dim stays a
    # multiple of 128 so in-kernel rolls are tile-aligned. Extra row
    # padding to H/2 + 16 per parity plane keeps the final block's
    # over-fetched (r + 8)-row slab in bounds.
    xp = jnp.pad(img.astype(jnp.bfloat16), ((0, 0), (1, 2 + 30), (1, 127)))
    xe, xo = xp[:, 0::2], xp[:, 1::2]  # (B, H/2+16, Wp) each
    wp = wd + 128
    # im2col kernel rows padded 12 -> 16 (sublane tile)
    kmat = jnp.zeros((16, 2 * co), jnp.bfloat16)
    kmat = kmat.at[:12].set(
        entry_kernel_h(w).reshape(12, 2 * co).astype(jnp.bfloat16)
    )
    nb = h2 // block_rows
    kernel = functools.partial(
        _kernel, r=block_rows, w=wd, nb=nb, variant=variant
    )
    if out_layout in ("hwbc", "hwbc_raw"):
        out_spec = pl.BlockSpec(
            (block_rows, wd, 2 * co), lambda bi, i: (i, 0, bi)
        )
        out_shape = jax.ShapeDtypeStruct((h2, wd, b * 2 * co), jnp.bfloat16)
    else:  # "bhwc"
        out_spec = pl.BlockSpec(
            (1, block_rows, wd, 2 * co), lambda bi, i: (bi, i, 0, 0)
        )
        out_shape = jax.ShapeDtypeStruct((b, h2, wd, 2 * co), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((16, 2 * co), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, 2 * co), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, 2 * co), lambda bi, i: (0, 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, block_rows + 8, wp), jnp.bfloat16),
            pltpu.VMEM((2, block_rows + 8, wp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(xe, xo, kmat, scale.reshape(1, -1).astype(jnp.float32),
      shift.reshape(1, -1).astype(jnp.float32))
    if out_layout == "hwbc":
        # logical NHWC; measured NOT free — XLA materialises the
        # transpose as a 0.96 ms copy at the headline shape. Consumers
        # that can read (H/2, W, B, 2co) directly (HWNC-labelled conv)
        # should use "hwbc_raw" instead.
        out = out.reshape(h2, wd, b, 2 * co).transpose(2, 0, 1, 3)
    return out


def _xla_reference(img, w, scale, shift):
    """The unfused composition the kernel replaces (for fallback and
    tests): conv3x3_s2dh_entry + per-channel affine + relu, computed the
    way S2DConvBNReLUH does (bf16 conv, f32 affine)."""
    from image_matching_tpu.ops.s2d_conv import conv3x3_s2dh_entry

    y = conv3x3_s2dh_entry(img[..., None].astype(jnp.bfloat16),
                           w.astype(jnp.bfloat16))
    y = y.astype(jnp.float32) * scale + shift
    return jnp.maximum(y, 0.0).astype(jnp.bfloat16)


def entry_h_fused(
    img: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Dispatching entry point: the Pallas kernel when the shape blocks
    (and on TPU / in interpret mode), else the XLA composition."""
    b, h, wd = img.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    if (interpret or on_tpu) and h % 2 == 0 and wd % 128 == 0:
        h2 = h // 2
        # r=8 measured fastest on v5e at the headline shape (0.53 ms vs
        # 0.95/1.00 at r=16/24 — smaller blocks pipeline the output DMA
        # better); larger r only as divisibility fallback. Candidates
        # must keep the over-fetched (r + 8)-row DMA slab a multiple of
        # 8 sublanes (the Mosaic constraint above), so r=4 (slab 12) is
        # NOT admissible — heights with H/2 % 8 != 0 fall through to
        # the XLA composition instead (ADVICE round-4 medium).
        for r in (8, 16):
            if h2 % r == 0:
                return entry_h_fused_pallas(
                    img, w, scale, shift, block_rows=r, interpret=interpret
                )
    return _xla_reference(img, w, scale, shift)
