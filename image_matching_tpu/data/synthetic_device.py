"""Synthetic-shapes training batches generated ON DEVICE.

The host SyntheticShapesDataset (data/datasets.py) draws with cv2 and
ships ~10 MB of float32 images per batch host→device; through this
environment's TPU relay that transfer throttles detector pretraining to
~1.5 it/s while the chip idles. Here the whole batch — background,
shapes, exact corner ground truth — is computed inside one jitted
program from a PRNG key, so the only per-step host→device traffic is
the key itself.

Rasterisation is branchless vectorized math over the pixel grid
(per-sample `lax.switch` over the three shape families, `vmap` over the
batch):

  polygons      star-triangulation around the centre; point-in-triangle
                via three half-plane cross-product signs
  line segments point-to-segment distance < thickness/2
  checkerboard  cell-index arithmetic with per-cell shades

Distribution parity with the host dataset (same families, count ranges,
shade ranges, margins) is asserted structurally in
tests/test_synthetic_device.py; corners are exact by construction —
drawn and reported at the same float coordinates (the cv2 path truncates
to int when drawing, so the device version's GT is tighter).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_POLYS = 3
MAX_VERTS = 6
MAX_LINES = 7
MAX_CB = 5  # max checkerboard rows/cols


def _grid(h: int, w: int):
    ys, xs = jnp.mgrid[0:h, 0:w]
    return xs.astype(jnp.float32), ys.astype(jnp.float32)


def _polygons(key, h, w, max_points):
    xs, ys = _grid(h, w)
    margin = max(4, min(h, w) // 8)
    rmax = min(h, w) * 0.2
    k = jax.random.split(key, 6)
    n_poly = jax.random.randint(k[0], (), 1, MAX_POLYS + 1)
    n_verts = jax.random.randint(k[1], (MAX_POLYS,), 3, MAX_VERTS + 1)
    centers = jax.random.uniform(
        k[2], (MAX_POLYS, 2),
        minval=jnp.array([margin, margin], jnp.float32),
        maxval=jnp.array([w - margin, h - margin], jnp.float32),
    )
    radii = jax.random.uniform(
        k[3], (MAX_POLYS, MAX_VERTS), minval=rmax * 0.3, maxval=rmax
    )
    angles = jnp.sort(
        jax.random.uniform(
            k[4], (MAX_POLYS, MAX_VERTS), maxval=2 * jnp.pi
        ),
        axis=-1,
    )
    shades = jax.random.uniform(k[5], (MAX_POLYS,), minval=0.4, maxval=1.0)

    # vertices; slots past n_verts wrap cyclically so extra star
    # triangles duplicate real ones (harmless under union)
    vid = jnp.arange(MAX_VERTS)
    verts = jnp.stack(
        [
            centers[:, 0:1] + radii * jnp.cos(angles),
            centers[:, 1:2] + radii * jnp.sin(angles),
        ],
        axis=-1,
    )  # (P, V, 2)
    wrap = jnp.mod(vid[None, :], n_verts[:, None])  # (P, V)
    vwrap = jnp.take_along_axis(verts, wrap[..., None], axis=1)
    vnext = jnp.take_along_axis(
        verts, jnp.mod(vid[None, :] + 1, n_verts[:, None])[..., None], axis=1
    )

    def tri_mask(c, a, b):
        """(H, W) bool: pixel inside triangle (c, a, b)."""
        def cross(o, d, px, py):
            return (d[0] - o[0]) * (py - o[1]) - (d[1] - o[1]) * (px - o[0])

        s1 = cross(a, b, xs, ys)
        s2 = cross(b, c, xs, ys)
        s3 = cross(c, a, xs, ys)
        return ((s1 >= 0) & (s2 >= 0) & (s3 >= 0)) | (
            (s1 <= 0) & (s2 <= 0) & (s3 <= 0)
        )

    def poly_mask(p):
        tri = jax.vmap(
            lambda i: tri_mask(centers[p], vwrap[p, i], vnext[p, i])
        )(jnp.arange(MAX_VERTS))
        return jnp.any(tri, axis=0)

    img = jnp.zeros((h, w), jnp.float32)
    painted = jnp.zeros((h, w), jnp.bool_)
    for p in range(MAX_POLYS):
        live = p < n_poly
        m = poly_mask(p) & live
        img = jnp.where(m, shades[p], img)
        painted = painted | m

    # GT corners: first n_verts of each live polygon
    pts = verts.reshape(-1, 2)
    vmask = (vid[None, :] < n_verts[:, None]) & (
        jnp.arange(MAX_POLYS)[:, None] < n_poly
    )
    mask = vmask.reshape(-1)
    pad = max_points - pts.shape[0]
    pts = jnp.pad(pts, ((0, pad), (0, 0)))
    mask = jnp.pad(mask, (0, pad))
    return img, painted, pts, mask


def _lines(key, h, w, max_points):
    xs, ys = _grid(h, w)
    margin = max(4, min(h, w) // 8)
    k = jax.random.split(key, 3)
    n_lines = jax.random.randint(k[0], (), 2, MAX_LINES + 1)
    ends = jax.random.uniform(
        k[1], (MAX_LINES, 2, 2),
        minval=jnp.array(
            [[margin, margin]] * 2, jnp.float32
        ),
        maxval=jnp.array(
            [[w - margin, h - margin]] * 2, jnp.float32
        ),
    )
    shades = jax.random.uniform(k[2], (MAX_LINES,), minval=0.4, maxval=1.0)

    def seg_mask(p0, p1):
        d = p1 - p0
        len2 = jnp.maximum(jnp.sum(d * d), 1e-6)
        t = jnp.clip(
            ((xs - p0[0]) * d[0] + (ys - p0[1]) * d[1]) / len2, 0.0, 1.0
        )
        px = p0[0] + t * d[0]
        py = p0[1] + t * d[1]
        return jnp.hypot(xs - px, ys - py) <= 1.0  # thickness 2

    img = jnp.zeros((h, w), jnp.float32)
    painted = jnp.zeros((h, w), jnp.bool_)
    for i in range(MAX_LINES):
        m = seg_mask(ends[i, 0], ends[i, 1]) & (i < n_lines)
        img = jnp.where(m, shades[i], img)
        painted = painted | m

    pts = ends.reshape(-1, 2)
    mask = jnp.repeat(jnp.arange(MAX_LINES) < n_lines, 2)
    pad = max_points - pts.shape[0]
    pts = jnp.pad(pts, ((0, pad), (0, 0)))
    mask = jnp.pad(mask, (0, pad))
    return img, painted, pts, mask


def _checkerboard(key, h, w, max_points):
    xs, ys = _grid(h, w)
    margin = max(4, min(h, w) // 8)
    k = jax.random.split(key, 5)
    rows = jax.random.randint(k[0], (), 3, MAX_CB + 1)
    cols = jax.random.randint(k[1], (), 3, MAX_CB + 1)
    cell = jnp.maximum(
        4.0,
        jax.random.uniform(
            k[2], (), minval=min(h, w) / 16, maxval=min(h, w) / 8
        ),
    ).astype(jnp.float32)
    cell = jnp.floor(cell)
    x0 = jax.random.uniform(
        k[3], (), minval=margin,
        maxval=jnp.maximum(margin + 1.0, w - MAX_CB * cell - margin),
    )
    y0 = jax.random.uniform(
        k[4], (), minval=margin,
        maxval=jnp.maximum(margin + 1.0, h - MAX_CB * cell - margin),
    )
    x0 = jnp.floor(x0)
    y0 = jnp.floor(y0)
    shades = jax.random.uniform(
        jax.random.fold_in(key, 7), (MAX_CB, MAX_CB), minval=0.6, maxval=1.0
    )

    c = jnp.floor((xs - x0) / cell).astype(jnp.int32)
    r = jnp.floor((ys - y0) / cell).astype(jnp.int32)
    inside = (c >= 0) & (c < cols) & (r >= 0) & (r < rows)
    even = (r + c) % 2 == 0
    rc = jnp.clip(r, 0, MAX_CB - 1)
    cc = jnp.clip(c, 0, MAX_CB - 1)
    m = inside & even
    img = jnp.where(m, shades[rc, cc], jnp.zeros((h, w), jnp.float32))

    gi = jnp.arange(MAX_CB + 1)
    gx, gy = jnp.meshgrid(gi, gi, indexing="xy")
    pts = jnp.stack(
        [x0 + gx.reshape(-1) * cell, y0 + gy.reshape(-1) * cell], axis=-1
    ).astype(jnp.float32)
    mask = (gx.reshape(-1) <= cols) & (gy.reshape(-1) <= rows)
    pad = max_points - pts.shape[0]
    pts = jnp.pad(pts, ((0, pad), (0, 0)))
    mask = jnp.pad(mask, (0, pad))
    return img, m, pts, mask


def synthetic_sample(key, height: int, width: int, max_points: int = 64):
    """One synthetic-shapes sample on device.

    Returns {image (H, W, 1) in [0, 1], points (P, 2) xy, points_mask (P,)}.
    Same families/ranges as SyntheticShapesDataset.sample."""
    if max_points < max(
        MAX_POLYS * MAX_VERTS, MAX_LINES * 2, (MAX_CB + 1) ** 2
    ):
        raise ValueError(f"max_points={max_points} too small")
    k_bg, k_kind, k_shape = jax.random.split(key, 3)
    bg = jax.random.uniform(k_bg, (), maxval=0.3)
    kind = jax.random.randint(k_kind, (), 0, 3)
    img, painted, pts, mask = jax.lax.switch(
        kind,
        [
            functools.partial(_polygons, h=height, w=width, max_points=max_points),
            functools.partial(_lines, h=height, w=width, max_points=max_points),
            functools.partial(_checkerboard, h=height, w=width, max_points=max_points),
        ],
        k_shape,
    )
    img = jnp.where(painted, img, bg)
    # keep only in-bounds corners (matches the host dataset's filter)
    inb = (
        (pts[:, 0] >= 0) & (pts[:, 0] < width)
        & (pts[:, 1] >= 0) & (pts[:, 1] < height)
    )
    return {
        "image": img[..., None],
        "points": pts,
        "points_mask": mask & inb,
    }


@functools.partial(
    jax.jit, static_argnames=("batch_size", "height", "width", "max_points")
)
def synthetic_batch(
    key, batch_size: int, height: int, width: int, max_points: int = 64
):
    """A full on-device batch: {image (B, H, W, 1), points, points_mask}."""
    keys = jax.random.split(key, batch_size)
    return jax.vmap(
        lambda k: synthetic_sample(k, height, width, max_points)
    )(keys)
