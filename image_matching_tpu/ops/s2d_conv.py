"""Space-to-depth-resident 3x3 convolutions (exact, MXU-shaped).

Motivation (measured on v5e, scripts/probe_backbone.py): the SuperPoint
backbone's hot layer — 3x3 stride-1 conv, 64→64 channels at 480×640 —
runs at ~39 TFLOPS under XLA's conv lowering because 64 channels only
half-fills the MXU's 128 lanes. A stride-1 3x3 conv on (H, W, C) is
*exactly* equal to four 2x2 convs on the space-to-depth tensor
(H/2, W/2, 4C), one per output-pixel parity (py, px), with rearranged
weights and parity-dependent SAME padding: the full-res tap row
u = py + ky − 1 decomposes as u = 2a + dy, so parity (py, px) reads the
2x2 decimated window at offset (py−1, px−1) over channels (dy, dx, ci).
Contraction size becomes 2·2·4C (= 1024 for C=64) at identical FLOP
count, so the MXU runs full. The whole backbone can stay in s2d space:
maxpool 2x2/s2 collapses to a max over the four parity channel groups.

Parity note: channel layouts are (dy, dx, ci) for inputs and
(py, px, co) for outputs, matching `space_to_depth` below (row-major).
This is the TPU-shaped replacement for the reference's plain torch
conv backbone (superpoint/models/unet_parts.py:10-91,
superglue/models/superpoint.py:144-160); outputs are bit-identical
(up to dtype rounding) to the direct conv, verified in
tests/test_s2d_conv.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) → (B, H/2, W/2, 4C), channel layout (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H/2, W/2, 4C) with (dy, dx, c) channels → (B, H, W, C)."""
    b, hh, wh, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hh, wh, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * 2, wh * 2, c)


def s2d_kernel(w: jax.Array, py: int, px: int) -> jax.Array:
    """Rearrange a (3, 3, ci, co) kernel into the (2, 2, 4ci, co) kernel
    of output parity (py, px) in s2d space.

    Full-res tap u = py + ky − 1 = 2a + dy with a ∈ {py−1, py},
    dy ∈ {0, 1}; kernel row r = a + 1 − py ∈ {0, 1} (same for cols)."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 4 * ci, co), w.dtype)
    for ky in range(3):
        u = py + ky - 1
        a, dy = u >> 1, u & 1
        r = a + 1 - py
        for kx in range(3):
            v = px + kx - 1
            b_, dx = v >> 1, v & 1
            s = b_ + 1 - px
            ch = (dy * 2 + dx) * ci
            out = out.at[r, s, ch:ch + ci, :].set(w[ky, kx])
    return out


def s2d_kernel_all(w: jax.Array) -> jax.Array:
    """(3, 3, ci, co) → (2, 2, 4ci, 4co): all four parity kernels stacked
    along output channels in (py, px, co) order."""
    return jnp.concatenate(
        [s2d_kernel(w, py, px) for py in range(2) for px in range(2)], axis=-1
    )


def conv3x3_s2d(x_s2d: jax.Array, w: jax.Array) -> jax.Array:
    """SAME 3x3 stride-1 conv computed in s2d space as ONE 2x2 conv.

    The four output parities read 2x2 decimated windows at offsets
    (py−1, px−1) — the same sliding window, just realigned. So a single
    VALID 2x2 conv over the once-padded input computes every parity with
    a K = 4ci contraction and N = 4co output width (MXU-saturating for
    ci = co = 64: K = 1024, N = 256; measured 242 vs 39 TFLOPS for the
    direct 3x3 on v5e, scripts/probe_s2d.py), and each parity group is
    then sliced back into alignment — an elementwise epilogue.

    Args:
      x_s2d: (B, H/2, W/2, 4·ci) space-to-depth input.
      w: (3, 3, ci, co) ordinary conv kernel.
    Returns:
      (B, H/2, W/2, 4·co) space-to-depth output — equal to
      s2d(conv3x3(d2s(x_s2d), w)).
    """
    hh, wh = x_s2d.shape[1], x_s2d.shape[2]
    co = w.shape[3]
    y = jax.lax.conv_general_dilated(
        x_s2d, s2d_kernel_all(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x_s2d.dtype,
    )  # (B, H/2+1, W/2+1, 4co); parity (py, px) group aligns at offset (py, px)
    outs = []
    for py in range(2):
        for px in range(2):
            g = y[:, py:py + hh, px:px + wh,
                  (py * 2 + px) * co:(py * 2 + px + 1) * co]
            outs.append(g)
    return jnp.concatenate(outs, axis=-1)


def maxpool2x2_s2d(x_s2d: jax.Array) -> jax.Array:
    """2x2/stride-2 maxpool in s2d space: max over the four parity
    channel groups — no spatial op at all."""
    b, hh, wh, c4 = x_s2d.shape
    c = c4 // 4
    return jnp.max(x_s2d.reshape(b, hh, wh, 4, c), axis=3)


# ---------------------------------------------------------------------------
# Fused pipeline variants (v2): no explicit space_to_depth transposes and no
# standalone realignment copies. Measured on v5e, XLA lowers the (dy, dx, c)
# relayout as a ~4 ms transpose and materialises the parity realign at
# +2.65 ms/conv, which erases the fast conv's win; these ops keep the whole
# backbone in s2d layout with the layout changes folded into convs/pools.
#
# Representations:
#   direct : ordinary (B, H, W, C) feature map
#   aligned: (B, H/2, W/2, 4C) s2d layout, groups aligned (== space_to_depth)
#   U      : (B, H/2+1, W/2+1, 4C) *unaligned* conv output; parity group
#            (py, px) holds its aligned value for index (i, j) at
#            U[i+py, j+px] — realignment deferred to the consumer.
# ---------------------------------------------------------------------------


def entry_kernel(w: jax.Array) -> jax.Array:
    """(3, 3, ci, co) → (4, 4, ci, 4co): kernel of the stride-2 conv that
    computes conv3x3-then-s2d straight from a direct-layout input.

    Output parity (py, px) taps full-res offsets u = py + ky − 1 ∈
    {py−1, .., py+1} ⊂ {−1..2}, i.e. kernel index u + 1 in a 4x4 window
    anchored at row 2i − 1 (pad ((1, 2), (1, 2)), stride 2)."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((4, 4, ci, 4 * co), w.dtype)
    for py in range(2):
        for px in range(2):
            g = (py * 2 + px) * co
            for ky in range(3):
                for kx in range(3):
                    u, v = py + ky - 1, px + kx - 1
                    out = out.at[u + 1, v + 1, :, g:g + co].set(w[ky, kx])
    return out


def conv3x3_s2d_entry(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME 3x3 conv fused with space_to_depth: direct (B, H, W, ci) in,
    aligned (B, H/2, W/2, 4co) out — one stride-2 4x4 conv, no transpose.
    Equal to space_to_depth(conv3x3(x, w))."""
    return jax.lax.conv_general_dilated(
        x, entry_kernel(w), (2, 2), ((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def conv3x3_s2d_raw(
    x_s2d: jax.Array, w: jax.Array, extra_cols: int = 0
) -> jax.Array:
    """SAME 3x3 conv in s2d space, returning the UNALIGNED conv output U
    (B, H/2+1, W/2+1+extra_cols, 4co) — the single MXU-saturating 2x2
    conv without the realignment copy. Consumers realign implicitly (see
    maxpool2x2_s2d_from_raw / realign).

    `extra_cols` widens the output with junk columns computed over extra
    right padding, so the column count can be rounded to the 8-sublane
    tiling the Pallas realign kernel's DMA requires
    (ops/pallas/realign.py) — consumers must then be told the true
    width (their `out_w` argument) instead of deriving it from shape."""
    return jax.lax.conv_general_dilated(
        x_s2d, s2d_kernel_all(w), (1, 1), ((1, 1), (1, 1 + extra_cols)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x_s2d.dtype,
    )


def realign(u: jax.Array) -> jax.Array:
    """U (B, H/2+1, W/2+1, 4C) → aligned (B, H/2, W/2, 4C)."""
    hh, wh = u.shape[1] - 1, u.shape[2] - 1
    c = u.shape[3] // 4
    return jnp.concatenate(
        [
            u[:, py:py + hh, px:px + wh, (py * 2 + px) * c:(py * 2 + px + 1) * c]
            for py in range(2) for px in range(2)
        ],
        axis=-1,
    )


def maxpool2x2_s2d_from_raw(u: jax.Array, out_w: int | None = None) -> jax.Array:
    """2x2/stride-2 maxpool fused with the realignment: U in, direct
    (B, H/2, W/2, C) out. Reads the four shifted parity slices and
    reduces — writes C channels instead of materialising the 4C aligned
    tensor first. `out_w` overrides the width for padded U (see
    conv3x3_s2d_raw's extra_cols)."""
    hh = u.shape[1] - 1
    wh = out_w if out_w is not None else u.shape[2] - 1
    c = u.shape[3] // 4
    gs = [
        u[:, py:py + hh, px:px + wh, (py * 2 + px) * c:(py * 2 + px + 1) * c]
        for py in range(2) for px in range(2)
    ]
    return jnp.maximum(jnp.maximum(gs[0], gs[1]), jnp.maximum(gs[2], gs[3]))


def mm1x1_s2d(x: jax.Array, w: jax.Array, bias=None) -> jax.Array:
    """1x1 conv in s2d layout (aligned or U — parity-wise, so alignment
    is irrelevant): (..., 4ci) @ (ci, co) → (..., 4co)."""
    *lead, c4 = x.shape
    ci, co = w.shape
    y = x.reshape(*lead, 4, ci) @ w
    if bias is not None:
        y = y + bias
    return y.reshape(*lead, 4 * co)


# ---------------------------------------------------------------------------
# H-only space-to-depth variants (v3): factor (2, 1) instead of (2, 2).
#
# The (2, 2) s2d conv above saturates the MXU but pays a structural FLOP
# tax: expressing a 3-tap window in 2-aligned space fills 3 of 4
# (row, dy) slots per axis, so the (2, 2, 4ci, 4co) kernel is 9/16 dense
# — the machine does 16/9 x the useful MACs. Splitting rows only keeps
# the column axis dense (3 true taps): the (2, 3, 2ci, 2co) kernel is
# 12/18... i.e. 3/4 dense along rows and fully dense along columns, so
# machine MACs drop to 12/9 of useful — 25% less than the (2, 2) form —
# while 2C = 128 channels still exactly fill the MXU's 128 lanes for the
# backbone's 64-channel levels. Realignment is also cheaper: parity
# groups differ by a ROW shift only, which moves whole (W, C) tiles
# instead of slicing the lane/sublane dims.
#
# Representations mirror the v2 pipeline:
#   direct : (B, H, W, C)
#   alignedH: (B, H/2, W, 2C), channels (dy, c) — space_to_depth_h
#   Uh     : (B, H/2+1, W, 2C) unaligned conv output; parity group dy'
#            = py holds its aligned row i value at Uh[i + py]
# ---------------------------------------------------------------------------


def space_to_depth_h(x: jax.Array) -> jax.Array:
    """(B, H, W, C) → (B, H/2, W, 2C), channel layout (dy, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w, c)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h // 2, w, 2 * c)


def depth_to_space_h(x: jax.Array) -> jax.Array:
    """(B, H/2, W, 2C) with (dy, c) channels → (B, H, W, C)."""
    b, hh, w, c2 = x.shape
    c = c2 // 2
    x = x.reshape(b, hh, w, 2, c)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, hh * 2, w, c)


def s2dh_kernel(w: jax.Array, py: int) -> jax.Array:
    """(3, 3, ci, co) → the (2, 3, 2ci, co) kernel of output row parity
    py in H-s2d space: full-res tap row u = py + ky − 1 = 2a + dy,
    kernel row r = a + 1 − py ∈ {0, 1}; columns stay dense."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 3, 2 * ci, co), w.dtype)
    for ky in range(3):
        u = py + ky - 1
        a, dy = u >> 1, u & 1
        r = a + 1 - py
        out = out.at[r, :, dy * ci:(dy + 1) * ci, :].set(w[ky])
    return out


def s2dh_kernel_all(w: jax.Array) -> jax.Array:
    """(3, 3, ci, co) → (2, 3, 2ci, 2co): both row-parity kernels stacked
    along output channels in (py, co) order."""
    return jnp.concatenate([s2dh_kernel(w, 0), s2dh_kernel(w, 1)], axis=-1)


def conv3x3_s2dh_raw(x_h: jax.Array, w: jax.Array) -> jax.Array:
    """SAME 3x3 stride-1 conv in H-s2d space: alignedH (B, H/2, W, 2ci)
    in → UNALIGNED Uh (B, H/2+1, W, 2co) out. Parity group py aligns at
    row offset py (realign_h / pool consumers shift rows only)."""
    return jax.lax.conv_general_dilated(
        x_h, s2dh_kernel_all(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x_h.dtype,
    )


def realign_h(u: jax.Array) -> jax.Array:
    """Uh (B, H/2+1, W, 2C) → alignedH (B, H/2, W, 2C): two row-shifted
    slices — no lane/sublane slicing.

    MISCOMPILE GUARD (round 5): the natural formulation
    ``concatenate([u[:, 0:hh, :, :c], u[:, 1:hh+1, :, c:]], -1)`` is
    miscompiled by the TPU backend under jit — the compiled program
    drops the second operand's +1 row shift and reads rows 0:hh for
    BOTH channel groups (wrong at every shape tried, exact in eager /
    on CPU; scripts/bisect_h_quality.py banks the repro). This was the
    round-3/4 H-layout quality regression: 2.13 px corner error vs
    0.46 px with the layout off at the reference eval regime. The
    4-operand (2, 2) ``realign`` does NOT trigger it. The elementwise
    select below is jit-exact on the same backend (and fuses at least
    as well: both row slices are full-channel, same-extent loads).
    Locked by scripts/tpu_quality_gate.py part A on hardware."""
    hh = u.shape[1] - 1
    c = u.shape[3] // 2
    mask = jnp.arange(u.shape[3]) < c
    return jnp.where(mask, u[:, 0:hh], u[:, 1:hh + 1])


def entry_kernel_h(w: jax.Array) -> jax.Array:
    """(3, 3, ci, co) → (4, 3, ci, 2co): kernel of the stride-(2, 1) conv
    computing conv3x3-then-s2d_h straight from a direct-layout input.
    Row parity py taps full-res rows u = py + ky − 1 ∈ {−1..2} → kernel
    row u + 1 in a 4-row window anchored at 2i − 1 (pad ((1, 2), (1, 1)),
    row stride 2); columns stay the dense 3 taps."""
    ci, co = w.shape[2], w.shape[3]
    out = jnp.zeros((4, 3, ci, 2 * co), w.dtype)
    for py in range(2):
        for ky in range(3):
            u = py + ky - 1
            out = out.at[u + 1, :, :, py * co:(py + 1) * co].set(w[ky])
    return out


def conv3x3_s2dh_entry(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME 3x3 conv fused with space_to_depth_h: direct (B, H, W, ci)
    in, alignedH (B, H/2, W, 2co) out — one stride-(2, 1) 4x3 conv.
    Equal to space_to_depth_h(conv3x3(x, w)).

    ci == 1 (the image-entry conv) dispatches to a tap-major matmul
    formulation: XLA lowers a 1-input-channel conv on the VPU as 12
    broadcast-fmas over the full-res (240x640x128) output — measured
    1.36 ms + 0.46 ms of input layout copies at the headline shape,
    profiler trace — while the same contraction phrased as
    (12 taps) @ (12, 2co) runs on the MXU in ~0.4 ms (bandwidth-bound
    on the output write). Taps are stacked on MAJOR axes so the patch
    build is whole-(W)-row slices, not minor-dim concats (an im2col
    with taps on the minor axis measured 3.1 ms,
    scripts/probe_entry_im2col.py)."""
    if x.shape[-1] == 1:
        return _entry_h_mm(x, w)
    return jax.lax.conv_general_dilated(
        x, entry_kernel_h(w), (2, 1), ((1, 2), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _entry_h_mm(x: jax.Array, w: jax.Array) -> jax.Array:
    """Tap-as-channels form of the ci=1 entry conv.

    Builds P[b, i, w, (u, kx)] = xpad[b, 2i - 1 + u, w + kx - 1] — taps
    stacked on MAJOR axes first ((i, w) stay minor, so every slice moves
    whole rows) and relaid to channels in one fused transpose (a 29 MB
    tensor at the headline shape) — then runs a 1x1 conv over the 12 tap
    channels. The 1x1 conv lowers to an MXU matmul AND keeps XLA's
    conv-preferred layouts, so the downstream in-level conv doesn't
    relayout (a dot_general here measured +0.43 ms on that conv)."""
    b, h, wd, _ = x.shape
    co = w.shape[3]
    img = x[..., 0]                                  # (B, H, W)
    img = jnp.pad(img, ((0, 0), (1, 2), (1, 1)))     # rows (1,2), cols (1,1)
    rows = jnp.stack(
        [img[:, u:u + h:2, :] for u in range(4)], axis=1
    )                                                # (B, 4, H/2, W+2)
    taps = jnp.stack(
        [rows[:, :, :, kx:kx + wd] for kx in range(3)], axis=2
    )                                                # (B, 4, 3, H/2, W)
    patches = taps.transpose(0, 3, 4, 1, 2).reshape(b, h // 2, wd, 12)
    kmat = entry_kernel_h(w).reshape(1, 1, 12, 2 * co)  # ci == 1
    return jax.lax.conv_general_dilated(
        patches, kmat, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )                                                # (B, H/2, W, 2co)


def maxpool2x2_s2dh_from_raw(u: jax.Array) -> jax.Array:
    """2x2/stride-2 maxpool fused with realignment: Uh in, direct
    (B, H/2, W/2, C) out. Rows reduce across the two parity groups
    (each s2d row covers both full-res rows); columns reduce pairwise
    via reduce_window — the reshape-(W/2, 2)-max and strided-slice
    formulations both relayout the sublane dim and measured ~2 ms
    slower at the level-1 shape (scripts/probe_poolh.py)."""
    hh = u.shape[1] - 1
    c = u.shape[3] // 2
    y = jnp.maximum(u[:, 0:hh, :, :c], u[:, 1:hh + 1, :, c:])  # (B,hh,W,C)
    init = -jnp.inf if y.dtype == jnp.float32 else jnp.finfo(y.dtype).min
    return jax.lax.reduce_window(
        y, init, jax.lax.max, (1, 1, 2, 1), (1, 1, 2, 1), "VALID"
    )


def mm1x1_s2dh(x: jax.Array, w: jax.Array, bias=None) -> jax.Array:
    """1x1 conv in H-s2d layout (aligned or Uh): (..., 2ci) @ (ci, co)
    → (..., 2co)."""
    *lead, c2 = x.shape
    ci, co = w.shape
    y = x.reshape(*lead, 2, ci) @ w
    if bias is not None:
        y = y + bias
    return y.reshape(*lead, 2 * co)
