"""Detector-label plumbing: space↔depth, dustbin labels, point splatting.

Parity targets in the reference: `SpaceToDepth`/`DepthToSpace`
(utils/d2s.py:8-44, duplicated in superpoint/models/model_utils.py:15-51),
`labels2Dto3D` (utils/utils.py:456-489), `flattenDetection`
(utils/utils.py:491-505), point scattering / bilinear label splatting
(datasets/data_tools.py:9-58) and heatmap aggregation `combine_heatmap`
(utils/utils.py:507-519). Implemented once, NHWC, fixed shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from image_matching_tpu.geometry.warp import warp_image


def space_to_depth(x: jax.Array, block: int = 8) -> jax.Array:
    """(B, H, W, C) -> (B, H/b, W/b, C*b*b); channel order (C, by, bx) to
    match the pixel-unshuffle the detector head expects."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    # -> (B, Hc, Wc, C, by, bx)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // block, w // block, c * block * block)


def depth_to_space(x: jax.Array, block: int = 8) -> jax.Array:
    """Inverse of `space_to_depth`."""
    b, hc, wc, cbb = x.shape
    c = cbb // (block * block)
    x = x.reshape(b, hc, wc, c, block, block)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, Hc, by, Wc, bx, C)
    return x.reshape(b, hc * block, wc * block, c)


@partial(jax.jit, static_argnames=("cell_size", "add_dustbin"))
def labels_2d_to_3d(
    labels: jax.Array, cell_size: int = 8, add_dustbin: bool = True
) -> jax.Array:
    """Keypoint map (B, H, W, 1) -> per-cell distribution (B, Hc, Wc, 65).

    Mirrors `labels2Dto3D` (utils/utils.py:456-468): space-to-depth, append
    a dustbin channel that is 1 only for empty cells, then normalise each
    cell to sum to 1.
    """
    cells = space_to_depth(labels, cell_size)  # (B, Hc, Wc, 64)
    if not add_dustbin:
        return cells
    occupancy = jnp.sum(cells, axis=-1, keepdims=True)
    dustbin = jnp.where(occupancy >= 1.0, 0.0, 1.0 - occupancy)
    # reference floors sub-1 dustbin values to 0 then renormalises
    dustbin = jnp.where(dustbin < 1.0, 0.0, dustbin)
    cells = jnp.concatenate([cells, dustbin], axis=-1)
    denom = jnp.sum(cells, axis=-1, keepdims=True)
    return cells / jnp.maximum(denom, 1e-12)


@partial(jax.jit, static_argnames=("cell_size", "dtype"))
def flatten_detection(
    semi: jax.Array, cell_size: int = 8, dtype=None
) -> jax.Array:
    """Raw detector logits (B, Hc, Wc, 65) -> dense heatmap (B, H, W, 1).

    Softmax over the 65 channels, drop the dustbin, pixel-shuffle up —
    `flattenDetection` (utils/utils.py:491-505) without the NCHW dance.

    The softmax always accumulates in f32; `dtype` (default: semi's
    dtype) sets the emitted heatmap precision — the inference detect
    path passes bfloat16, halving the full-resolution pixel-shuffle
    and NMS traffic (probabilities near the 0.005-0.015 thresholds
    carry ~2e-5 resolution in bf16).
    """
    dense = jax.nn.softmax(semi.astype(jnp.float32), axis=-1)
    nodust = dense[..., :-1].astype(dtype or semi.dtype)
    return depth_to_space(nodust, cell_size)


@partial(jax.jit, static_argnames=("height", "width"))
def scatter_points(
    xy: jax.Array, mask: jax.Array, height: int, width: int
) -> jax.Array:
    """Masked (K, 2) points -> (H, W) binary map (nearest-pixel rounding).

    The static-shape replacement for the reference's boolean-indexed
    scatter (datasets/data_tools.py:20-26): invalid slots are routed to a
    dump row via clipping + a zero add.
    """
    ix = jnp.round(xy[..., 0]).astype(jnp.int32)
    iy = jnp.round(xy[..., 1]).astype(jnp.int32)
    ok = mask & (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height)
    ix = jnp.clip(ix, 0, width - 1)
    iy = jnp.clip(iy, 0, height - 1)
    flat = jnp.zeros((height * width,), dtype=jnp.float32)
    flat = flat.at[iy * width + ix].max(ok.astype(jnp.float32))
    return flat.reshape(height, width)


@partial(jax.jit, static_argnames=("height", "width"))
def splat_points_bilinear(
    xy: jax.Array, mask: jax.Array, height: int, width: int
) -> jax.Array:
    """Masked (K, 2) subpixel points -> (H, W) soft map via 4-neighbour
    bilinear splatting (`get_labels_bi`, datasets/data_tools.py:27-35)."""
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    flat = jnp.zeros((height * width,), dtype=jnp.float32)
    for dx, dy, w in (
        (0, 0, (1 - fx) * (1 - fy)),
        (1, 0, fx * (1 - fy)),
        (0, 1, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        ix, iy = x0 + dx, y0 + dy
        ok = mask & (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height)
        ix = jnp.clip(ix, 0, width - 1)
        iy = jnp.clip(iy, 0, height - 1)
        flat = flat.at[iy * width + ix].add(jnp.where(ok, w, 0.0))
    return jnp.clip(flat.reshape(height, width), 0.0, 1.0)


@jax.jit
def combine_heatmaps(
    heatmaps: jax.Array, inv_homographies: jax.Array, masks: jax.Array
) -> jax.Array:
    """Homographic-adaptation aggregation (`combine_heatmap`,
    utils/utils.py:507-519): mask each warped-view heatmap, warp it back to
    the original frame with the inverse homography, and average by the
    warped-back mask sum.

    Args:
      heatmaps: (N, H, W, 1) heatmaps predicted on N warped views.
      inv_homographies: (N, 3, 3) — inverse of each sampling homography.
      masks: (N, H, W, 1) validity of each warped view.

    Returns: (H, W, 1) aggregated heatmap.
    """
    masked = heatmaps * masks
    back = warp_image(masked, inv_homographies, mode="bilinear")
    masks_back = warp_image(masks, inv_homographies, mode="bilinear")
    num = jnp.sum(back, axis=0)
    den = jnp.sum(masks_back, axis=0)
    return num / jnp.maximum(den, 1e-6)
