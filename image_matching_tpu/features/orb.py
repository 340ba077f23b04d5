"""FAST + rotated-BRIEF (ORB-style) detector + binary descriptor in JAX.

Replaces OpenCV's C++ ORB used by `Traditional/registration.py:61-63`
(`cv2.ORB_create` → detectAndCompute + BFMatcher Hamming). TPU-first
formulation: the FAST ring test is 16 rolled comparisons evaluated for
the whole image at once on the VPU; orientation is the intensity
centroid; BRIEF is 256 pairwise intensity tests gathered at rotated
offsets and packed into 32 uint8 bytes that feed ops/matching.py's
Hamming matmul matcher.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from image_matching_tpu.geometry.warp import bilinear_sample, nearest_sample
from image_matching_tpu.ops.nms import simple_nms
from image_matching_tpu.structs import Keypoints

# Bresenham circle of radius 3 — the FAST-9/16 ring, clockwise from 12 o'clock
_RING = [
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
]  # (dx, dy)


class ORBConfig(NamedTuple):
    max_keypoints: int = 512
    fast_threshold: float = 20.0 / 255.0
    fast_arc: int = 9  # contiguous ring pixels required
    nms_radius: int = 3
    n_tests: int = 256  # BRIEF bits (32 bytes)
    patch_radius: int = 15
    pattern_seed: int = 7
    blur_sigma: float = 1.2
    n_levels: int = 8  # scale pyramid depth (cv2.ORB_create default)
    scale_factor: float = 1.2


def _ring_stack(img: jax.Array) -> jax.Array:
    """(16, H, W): ring pixel intensity at each offset via jnp.roll."""
    outs = []
    for dx, dy in _RING:
        outs.append(jnp.roll(jnp.roll(img, -dy, 0), -dx, 1))
    return jnp.stack(outs)


def fast_score(img: jax.Array, cfg: ORBConfig) -> jax.Array:
    """FAST-N corner mask * score. img: (H, W). Returns (H, W) score map
    (0 where not a corner)."""
    ring = _ring_stack(img)  # (16, H, W)
    center = img[None]
    brighter = ring > center + cfg.fast_threshold
    darker = ring < center - cfg.fast_threshold

    def max_run(mask):
        """longest circular run of True along axis 0 (16 entries)."""
        doubled = jnp.concatenate([mask, mask], axis=0).astype(jnp.int32)

        def body(carry, row):
            run = (carry + 1) * row
            return run, run

        _, runs = jax.lax.scan(body, jnp.zeros_like(doubled[0]), doubled)
        return jnp.max(runs, axis=0)

    arc_b = max_run(brighter)
    arc_d = max_run(darker)
    is_corner = (arc_b >= cfg.fast_arc) | (arc_d >= cfg.fast_arc)
    # score: sum of absolute ring differences (OpenCV's sumAbsDiff variant)
    score = jnp.sum(
        jnp.where(brighter | darker, jnp.abs(ring - center), 0.0), axis=0
    )
    return jnp.where(is_corner, score, 0.0)


def _orientation_centroid(img: jax.Array, xy: jax.Array, radius: int) -> jax.Array:
    """Intensity-centroid orientation (Rosin moment): θ = atan2(m01, m10)."""
    dy, dx = jnp.meshgrid(
        jnp.arange(-radius, radius + 1), jnp.arange(-radius, radius + 1),
        indexing="ij",
    )
    disk = (dx * dx + dy * dy <= radius * radius).astype(jnp.float32)
    offs = jnp.stack([dx, dy], -1).reshape(-1, 2).astype(jnp.float32)
    w = disk.reshape(-1)
    coords = xy[:, None, :] + offs[None]
    vals = bilinear_sample(img[..., None], coords)[..., 0] * w[None]
    m10 = jnp.sum(vals * offs[None, :, 0], axis=-1)
    m01 = jnp.sum(vals * offs[None, :, 1], axis=-1)
    return jnp.arctan2(m01, m10)


def _brief_pattern(cfg: ORBConfig) -> jax.Array:
    """(n_tests, 2, 2) gaussian-distributed test-point pairs (fixed seed)."""
    key = jax.random.PRNGKey(cfg.pattern_seed)
    pts = jax.random.normal(key, (cfg.n_tests, 2, 2)) * (cfg.patch_radius / 2.0)
    return jnp.clip(pts, -cfg.patch_radius, cfg.patch_radius)


def _detect_level(image: jax.Array, k_level: int, cfg: ORBConfig) -> Keypoints:
    """Single-pyramid-level FAST + oriented BRIEF. image: (H, W) at this
    level's resolution; keeps the `k_level` best corners (level coords)."""
    h, w = image.shape

    score = fast_score(image, cfg)
    score = simple_nms(score[None], cfg.nms_radius)[0]
    b = cfg.patch_radius + 1
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = (ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)
    score = jnp.where(inb, score, 0.0)

    flat = score.reshape(-1)
    top, idx = jax.lax.top_k(flat, k_level)
    yy = (idx // w).astype(jnp.float32)
    xx = (idx % w).astype(jnp.float32)
    xy = jnp.stack([xx, yy], -1)
    mask = top > 0

    # smoothed image for BRIEF comparisons (noise robustness)
    g = jnp.exp(
        -0.5
        * (jnp.arange(-3, 4, dtype=jnp.float32) / cfg.blur_sigma) ** 2
    )
    g = g / jnp.sum(g)
    sm = jax.lax.conv_general_dilated(
        image[None, None], g[None, None, :, None], (1, 1), "SAME"
    )
    sm = jax.lax.conv_general_dilated(
        sm, g[None, None, None, :], (1, 1), "SAME"
    )[0, 0]

    theta = _orientation_centroid(sm, xy, cfg.patch_radius // 2)

    pattern = _brief_pattern(cfg)  # (T, 2, 2)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.stack(
        [jnp.stack([ct, -st], -1), jnp.stack([st, ct], -1)], -2
    )  # (K, 2, 2)
    rp = jnp.einsum("tpj,kij->ktpi", pattern, rot)  # (K, T, 2, 2)
    coords = xy[:, None, None, :] + rp
    vals = nearest_sample(sm[..., None], coords)[..., 0]  # (K, T, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint8)  # (K, T)

    # pack 8 bits per byte, MSB first (matches ops/matching._unpack_pm1)
    kk, t = bits.shape
    bytes_ = bits.reshape(kk, t // 8, 8)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    packed = jnp.sum(
        bytes_.astype(jnp.uint32) << shifts[None, None, :].astype(jnp.uint32),
        axis=-1,
    ).astype(jnp.uint8)

    return Keypoints(
        xy=xy,
        score=jnp.where(mask, top, 0.0),
        mask=mask,
        desc=packed,
    )


def _level_quotas(cfg: ORBConfig, n_levels: int) -> list:
    """cv2-style geometric per-level feature budget summing to
    max_keypoints (ORB.cpp distributes nfeatures ∝ level area)."""
    f = 1.0 / cfg.scale_factor
    w = [f**i for i in range(n_levels)]
    s = sum(w)
    q = [int(cfg.max_keypoints * wi / s) for wi in w]
    q[0] += cfg.max_keypoints - sum(q)
    return q


@partial(jax.jit, static_argnames=("cfg",))
def orb_detect_and_describe(
    image: jax.Array, cfg: ORBConfig = ORBConfig()
) -> Keypoints:
    """(H, W) or (H, W, 1) grayscale [0,1] → Keypoints with packed uint8
    descriptors (desc dtype uint8, shape (K, n_tests/8)).

    Detects over an `n_levels`-deep scale pyramid (bilinear downscale by
    `scale_factor`, cv2.ORB_create defaults 8 × 1.2) with geometric
    per-level quotas; keypoint coords are reported at full resolution.
    The pyramid is what makes smooth photographic texture detectable —
    single-scale FAST fires only on the finest corners."""
    if image.ndim == 3:
        image = image[..., 0]
    image = image.astype(jnp.float32)
    h, w = image.shape

    min_side = 2 * (cfg.patch_radius + 1) + 8
    n_run = 1
    while (
        n_run < cfg.n_levels
        and min(h, w) / cfg.scale_factor**n_run >= min_side
    ):
        n_run += 1
    quotas = _level_quotas(cfg, n_run)
    parts = []
    for level, k_level in enumerate(quotas):
        scale = cfg.scale_factor**level
        h_l, w_l = int(round(h / scale)), int(round(w / scale))
        img_l = (
            image
            if level == 0
            else jax.image.resize(image, (h_l, w_l), "linear")
        )
        kp = _detect_level(img_l, k_level, cfg)
        parts.append(kp.replace(xy=kp.xy * scale))

    return Keypoints(
        xy=jnp.concatenate([p.xy for p in parts]),
        score=jnp.concatenate([p.score for p in parts]),
        mask=jnp.concatenate([p.mask for p in parts]),
        desc=jnp.concatenate([p.desc for p in parts]),
    )
