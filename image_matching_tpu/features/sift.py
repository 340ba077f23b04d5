"""DoG/SIFT-style detector + descriptor in pure JAX (Lowe, IJCV 2004).

Replaces the OpenCV C++ SIFT the reference calls through
`Traditional/registration.py:16-18` (cv2.xfeatures2d.SIFT_create →
detectAndCompute). This is a TPU-first re-design, not a binding: the
whole pyramid is built with separable convolutions, scale-space extrema
are found with reduce-window comparisons, and orientation/descriptor
extraction is a batch of bilinear gathers over precomputed gradient
maps — one jitted program per image size, fixed-K masked output.

Deliberate deltas vs OpenCV (documented, covered by behavioural tests):
fixed keypoint capacity per octave instead of unbounded lists, single
dominant orientation per keypoint, no double-size first octave.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from image_matching_tpu.geometry.warp import bilinear_sample
from image_matching_tpu.ops.nms import max_pool_2d
from image_matching_tpu.structs import Keypoints


class SIFTConfig(NamedTuple):
    n_octaves: int = 4
    scales_per_octave: int = 3  # DoG layers searched per octave
    sigma0: float = 1.6
    # OpenCV's analogue is ~0.04/3 on [0,1] images; 0.006 measured better
    # on the synthetic eval regime (success 0.75 -> 1.00, see EVAL.md)
    contrast_threshold: float = 0.006
    edge_threshold: float = 10.0
    max_keypoints: int = 1024
    per_octave_cap: int = 512
    descriptor_width: int = 4  # 4x4 spatial bins
    descriptor_bins: int = 8  # orientation bins -> 128-d


def _gauss_kernel(sigma: float) -> jax.Array:
    radius = max(1, int(3.0 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / jnp.sum(g)


def _blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable gaussian blur of (H, W)."""
    g = _gauss_kernel(sigma)
    x = img[None, None]
    x = jax.lax.conv_general_dilated(x, g[None, None, :, None], (1, 1), "SAME")
    x = jax.lax.conv_general_dilated(x, g[None, None, None, :], (1, 1), "SAME")
    return x[0, 0]


def _downsample2(img: jax.Array) -> jax.Array:
    return img[::2, ::2]


def _octave_extrema(
    dogs: jax.Array,  # (S+2, H, W) DoG stack for one octave
    cfg: SIFTConfig,
    key_cap: int,
):
    """Scale-space extrema: max/min among the 26 neighbours, with
    contrast and edge-response filtering. Returns flat (cap,) indices,
    scores, scale-layer ids and validity for this octave."""
    s, h, w = dogs.shape
    maxp = max_pool_2d(dogs, 3)  # per-layer 3x3 spatial max
    minp = -max_pool_2d(-dogs, 3)

    mids = dogs[1:-1]  # layers searched
    is_max = (
        (mids >= maxp[:-2]) & (mids >= maxp[2:])
        & (mids == maxp[1:-1])
    )
    is_min = (
        (mids <= minp[:-2]) & (mids <= minp[2:])
        & (mids == minp[1:-1])
    )
    extremum = (is_max | is_min) & (jnp.abs(mids) > cfg.contrast_threshold)

    # edge response: 2x2 spatial Hessian ratio test (Lowe §4.1)
    dxx = jnp.roll(mids, -1, 2) + jnp.roll(mids, 1, 2) - 2 * mids
    dyy = jnp.roll(mids, -1, 1) + jnp.roll(mids, 1, 1) - 2 * mids
    dxy = (
        jnp.roll(jnp.roll(mids, -1, 1), -1, 2)
        - jnp.roll(jnp.roll(mids, -1, 1), 1, 2)
        - jnp.roll(jnp.roll(mids, 1, 1), -1, 2)
        + jnp.roll(jnp.roll(mids, 1, 1), 1, 2)
    ) / 4.0
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = cfg.edge_threshold
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    extremum = extremum & edge_ok

    # border guard (descriptor window)
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    b = 8
    extremum = extremum & (ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)

    resp = jnp.where(extremum, jnp.abs(mids), 0.0)
    flat = resp.reshape(-1)
    scores, idx = jax.lax.top_k(flat, key_cap)
    layer = idx // (h * w)
    rem = idx % (h * w)
    yy = rem // w
    xx = rem % w
    valid = scores > 0
    return xx, yy, layer, scores, valid


def _orientation(
    grad_mag: jax.Array, grad_ori: jax.Array, x, y, radius: int = 8
):
    """Dominant gradient orientation in a square window (36-bin hist)."""
    dy, dx = jnp.meshgrid(
        jnp.arange(-radius, radius + 1), jnp.arange(-radius, radius + 1),
        indexing="ij",
    )
    offs = jnp.stack([dx, dy], -1).reshape(-1, 2).astype(jnp.float32)
    coords = jnp.stack([x, y], -1)[:, None, :] + offs[None]  # (K, P, 2)
    mag = bilinear_sample(grad_mag[..., None], coords)[..., 0]
    ori = bilinear_sample(grad_ori[..., None], coords)[..., 0]
    sigma = radius / 2.0
    wgt = jnp.exp(-0.5 * jnp.sum(offs**2, -1) / sigma**2)[None]
    nbins = 36
    bins = jnp.floor((ori + math.pi) / (2 * math.pi) * nbins).astype(jnp.int32) % nbins
    hist = jax.vmap(
        lambda b, wm: jnp.zeros((nbins,)).at[b].add(wm)
    )(bins, mag * wgt)
    best = jnp.argmax(hist, axis=-1)
    return (best.astype(jnp.float32) + 0.5) / nbins * 2 * math.pi - math.pi


def _descriptor(
    grad_mag, grad_ori, x, y, theta, scale_mult, cfg: SIFTConfig
):
    """128-d SIFT descriptor: 4x4 spatial x 8 orientation bins over a
    rotated 16x16 sample grid, gaussian-weighted, normalised, clipped at
    0.2, renormalised (Lowe §6)."""
    width = cfg.descriptor_width  # 4
    nbins = cfg.descriptor_bins  # 8
    n_samp = width * 4  # 16x16 samples

    lin = jnp.arange(n_samp) - (n_samp - 1) / 2.0  # unit sample spacing
    sy, sx = jnp.meshgrid(lin, lin, indexing="ij")
    offs = jnp.stack([sx, sy], -1).reshape(-1, 2)  # (256, 2), unrotated

    ct, st = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.stack(
        [jnp.stack([ct, -st], -1), jnp.stack([st, ct], -1)], -2
    )  # (K, 2, 2)
    # per-keypoint scale: spacing between samples in pixels
    roffs = jnp.einsum("pj,kij->kpi", offs, rot) * scale_mult[:, None, None]
    coords = jnp.stack([x, y], -1)[:, None, :] + roffs

    mag = bilinear_sample(grad_mag[..., None], coords)[..., 0]  # (K, 256)
    ori = bilinear_sample(grad_ori[..., None], coords)[..., 0] - theta[:, None]

    # gaussian weight over the (scale-invariant) sample grid
    half = n_samp / 2.0
    wgt = jnp.exp(-0.5 * jnp.sum(offs**2, -1)[None] / (half * 0.5) ** 2)

    # spatial bin of each sample (4x4 of 4x4-sample cells)
    cell = jnp.arange(n_samp) // 4
    cy, cx = jnp.meshgrid(cell, cell, indexing="ij")
    spatial_bin = (cy * width + cx).reshape(-1)  # (256,)

    obin = jnp.floor((ori + math.pi) / (2 * math.pi) * nbins).astype(jnp.int32) % nbins
    flat_bin = spatial_bin[None] * nbins + obin  # (K, 256)

    def hist_one(b, v):
        return jnp.zeros((width * width * nbins,)).at[b].add(v)

    desc = jax.vmap(hist_one)(flat_bin, mag * wgt)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    return desc


@partial(jax.jit, static_argnames=("cfg",))
def sift_detect_and_describe(
    image: jax.Array, cfg: SIFTConfig = SIFTConfig()
) -> Keypoints:
    """(H, W) or (H, W, 1) grayscale [0,1] → Keypoints with 128-d desc.

    Coordinates are full-resolution pixels; score is |DoG| response.
    Batch with jax.vmap for multiple images of one shape.
    """
    if image.ndim == 3:
        image = image[..., 0]
    image = image.astype(jnp.float32)

    s = cfg.scales_per_octave
    k = 2.0 ** (1.0 / s)
    sigmas = [cfg.sigma0 * (k**i) for i in range(s + 3)]

    all_parts = []
    base = _blur(image, cfg.sigma0)
    for octave in range(cfg.n_octaves):
        if min(base.shape) < 32:
            break
        # gaussian stack (incremental blurs) and DoG
        gs = [base]
        for i in range(1, s + 3):
            inc = math.sqrt(max(sigmas[i] ** 2 - sigmas[i - 1] ** 2, 1e-6))
            gs.append(_blur(gs[-1], inc))
        dogs = jnp.stack([gs[i + 1] - gs[i] for i in range(s + 2)])

        xx, yy, layer, scores, valid = _octave_extrema(
            dogs, cfg, cfg.per_octave_cap
        )
        xf = xx.astype(jnp.float32)
        yf = yy.astype(jnp.float32)

        # gradients of the matching gaussian layer (use layer-1 blur index
        # approximation: the middle of the stack)
        g_mid = gs[s // 2 + 1]
        gx = (jnp.roll(g_mid, -1, 1) - jnp.roll(g_mid, 1, 1)) / 2.0
        gy = (jnp.roll(g_mid, -1, 0) - jnp.roll(g_mid, 1, 0)) / 2.0
        gmag = jnp.sqrt(gx * gx + gy * gy)
        gori = jnp.arctan2(gy, gx)

        theta = _orientation(gmag, gori, xf, yf)
        scale_mult = 1.0 + 0.5 * layer.astype(jnp.float32) / s
        desc = _descriptor(gmag, gori, xf, yf, theta, scale_mult, cfg)

        factor = float(2**octave)
        all_parts.append(
            (
                jnp.stack([xf, yf], -1) * factor,
                scores,
                valid,
                desc,
            )
        )
        base = _downsample2(gs[s])  # next octave base (2x sigma0 layer)

    xy = jnp.concatenate([p[0] for p in all_parts], axis=0)
    score = jnp.concatenate([p[1] for p in all_parts], axis=0)
    valid = jnp.concatenate([p[2] for p in all_parts], axis=0)
    desc = jnp.concatenate([p[3] for p in all_parts], axis=0)

    top_scores, sel = jax.lax.top_k(
        jnp.where(valid, score, -1.0), cfg.max_keypoints
    )
    mask = top_scores > 0
    return Keypoints(
        xy=xy[sel],
        score=jnp.where(mask, top_scores, 0.0),
        mask=mask,
        desc=desc[sel] * mask[:, None],
    )
