"""Homographies: sampling, solving, and point warping — pure JAX, fully jittable.

Capability parity with the reference's `utils/homographies.py` (random
homography sampler, `sample_homography_np:12-117`) and `utils/utils.py`
(`warp_points:561-584`, `filter_points:551-559`, `homography_scaling_torch`,
`normPts/denormPts:586-603`), re-designed so that sampling runs on-device
under `jit`/`vmap`: the reference's rejection-sampling over candidate
scales/rotations becomes a masked categorical draw over a static candidate
set, so shapes stay static.

Conventions:
  * Points are (..., 2) arrays in (x, y) pixel coordinates.
  * A homography `H` is a (..., 3, 3) matrix acting on homogeneous
    (x, y, 1) columns: `p_dst ∝ H @ p_src`.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


def identity_homography(dtype=jnp.float32) -> jax.Array:
    return jnp.eye(3, dtype=dtype)


def invert_homography(h: jax.Array) -> jax.Array:
    return jnp.linalg.inv(h)


def warp_points(points: jax.Array, homography: jax.Array) -> jax.Array:
    """Apply homographies to (x, y) points.

    Args:
      points: (..., N, 2).
      homography: (..., 3, 3), broadcastable against `points` batch dims.

    Returns:
      (..., N, 2) warped points.
    """
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    hom = jnp.concatenate([points, ones], axis=-1)  # (..., N, 3)
    warped = jnp.einsum("...ij,...nj->...ni", homography.astype(points.dtype), hom)
    return warped[..., :2] / (warped[..., 2:3] + 1e-12)


def points_in_bounds(points: jax.Array, height: int, width: int) -> jax.Array:
    """Boolean mask of points inside [0, W-1] x [0, H-1] (inclusive)."""
    x, y = points[..., 0], points[..., 1]
    return (x >= 0) & (x <= width - 1) & (y >= 0) & (y <= height - 1)


def normalize_points(points: jax.Array, height: int, width: int) -> jax.Array:
    """Pixel coords -> [-1, 1] (align_corners=False style: p/shape*2-1)."""
    shape = jnp.asarray([width, height], dtype=points.dtype)
    return points / shape * 2.0 - 1.0


def denormalize_points(points: jax.Array, height: int, width: int) -> jax.Array:
    shape = jnp.asarray([width, height], dtype=points.dtype)
    return (points + 1.0) * shape / 2.0


def scale_homography(h: jax.Array, height: int, width: int,
                     to_normalized: bool = False) -> jax.Array:
    """Convert a homography between pixel and [-1, 1] normalized frames.

    Mirrors the behaviour of `homography_scaling_torch` / `scale_homography_torch`
    (utils/utils.py:595-598, utils/homographies.py:121-125): with
    `to_normalized=False`, takes an H acting on normalized coords and returns
    the pixel-frame equivalent; with `to_normalized=True`, the reverse.
    """
    t = jnp.array(
        [[2.0 / width, 0.0, -1.0], [0.0, 2.0 / height, -1.0], [0.0, 0.0, 1.0]],
        dtype=h.dtype,
    )
    t_inv = jnp.linalg.inv(t)
    if to_normalized:
        return t @ h @ t_inv
    return t_inv @ h @ t


def homography_from_4pts(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Exact homography mapping 4 source points to 4 destination points.

    The DLT system of cv2.getPerspectiveTransform (as rebuilt in
    utils/homographies.py:112-116), solved with `jnp.linalg.solve` so it
    vmaps/jits. src, dst: (..., 4, 2).
    """
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    ax = jnp.stack([x, y, ones, zeros, zeros, zeros, -x * u, -y * u], axis=-1)
    ay = jnp.stack([zeros, zeros, zeros, x, y, ones, -x * v, -y * v], axis=-1)
    a_mat = jnp.concatenate([ax, ay], axis=-2)  # (..., 8, 8)
    b_vec = jnp.concatenate([u, v], axis=-1)[..., None]  # (..., 8, 1)
    h8 = jnp.linalg.solve(a_mat, b_vec)[..., 0]  # (..., 8)
    h9 = jnp.concatenate([h8, jnp.ones(h8.shape[:-1] + (1,), h8.dtype)], axis=-1)
    return h9.reshape(h9.shape[:-1] + (3, 3))


class HomographyConfig(NamedTuple):
    """Knobs of the random homography sampler (reference defaults at
    utils/homographies.py:13-16)."""

    perspective: bool = True
    scaling: bool = True
    rotation: bool = True
    translation: bool = True
    n_scales: int = 5
    n_angles: int = 25
    scaling_amplitude: float = 0.1
    perspective_amplitude_x: float = 0.1
    perspective_amplitude_y: float = 0.1
    patch_ratio: float = 0.5
    max_angle: float = math.pi / 2
    allow_artifacts: bool = False
    translation_overflow: float = 0.0


def _masked_choice(key: jax.Array, candidates: jax.Array, valid: jax.Array) -> jax.Array:
    """Pick one candidate uniformly among the valid ones (static shape).

    Replaces the reference's `np.where(valid)[0]` + randint rejection step
    (utils/homographies.py:76-82) with a Gumbel-max draw over masked logits.
    """
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits)
    return candidates[idx]


def sample_homography(
    key: jax.Array,
    height: int,
    width: int,
    config: HomographyConfig = HomographyConfig(),
) -> jax.Array:
    """Sample a random valid homography, on-device and jittable.

    Behavioural port of `sample_homography_np` (utils/homographies.py:12-117):
    start from a centered patch of `patch_ratio`, perturb its corners with a
    truncated-normal perspective jitter, then random scale / translation /
    rotation with validity filtering, and solve the 4-point DLT at pixel
    scale. Returns H mapping full-image corner coords to the sampled patch
    (same direction as the reference: getPerspectiveTransform(pts1, pts2)).

    Use `jax.vmap(sample_homography, in_axes=(0, None, None, None))` for a
    batch — e.g. the 50-way homographic-adaptation stack.
    """
    cfg = config
    k_persp, k_scale_v, k_scale_c, k_trans, k_rot_c = jax.random.split(key, 5)

    corners = jnp.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
    margin = (1.0 - cfg.patch_ratio) / 2.0
    pts2 = margin + cfg.patch_ratio * corners

    std_trunc = 2.0

    if cfg.perspective:
        amp_x = cfg.perspective_amplitude_x
        amp_y = cfg.perspective_amplitude_y
        if not cfg.allow_artifacts:
            amp_x = min(amp_x, margin)
            amp_y = min(amp_y, margin)
        disp = jax.random.truncated_normal(k_persp, -std_trunc, std_trunc, (3,))
        persp_d = disp[0] * amp_y / 2.0
        h_left = disp[1] * amp_x / 2.0
        h_right = disp[2] * amp_x / 2.0
        pts2 = pts2 + jnp.stack(
            [
                jnp.stack([h_left, persp_d]),
                jnp.stack([h_left, -persp_d]),
                jnp.stack([h_right, persp_d]),
                jnp.stack([h_right, -persp_d]),
            ]
        )

    if cfg.scaling:
        scales = 1.0 + jax.random.truncated_normal(
            k_scale_v, -std_trunc, std_trunc, (cfg.n_scales,)
        ) * (cfg.scaling_amplitude / 2.0)
        scales = jnp.concatenate([jnp.ones((1,)), scales])
        center = jnp.mean(pts2, axis=0, keepdims=True)
        scaled = (pts2 - center)[None] * scales[:, None, None] + center
        if cfg.allow_artifacts:
            valid = jnp.ones((scales.shape[0],), dtype=bool)
        else:
            valid = jnp.all((scaled >= 0.0) & (scaled < 1.0), axis=(1, 2))
            # scale = 1 (index 0) is always a fallback
            valid = valid.at[0].set(True)
        pts2 = _masked_choice(k_scale_c, scaled, valid)

    if cfg.translation:
        t_min = jnp.min(pts2, axis=0)
        t_max = jnp.min(1.0 - pts2, axis=0)
        if cfg.allow_artifacts:
            t_min = t_min + cfg.translation_overflow
            t_max = t_max + cfg.translation_overflow
        u = jax.random.uniform(k_trans, (2,))
        shift = -t_min + u * (t_max + t_min)
        pts2 = pts2 + shift[None, :]

    if cfg.rotation:
        angles = jnp.linspace(-cfg.max_angle, cfg.max_angle, cfg.n_angles)
        angles = jnp.concatenate([angles, jnp.zeros((1,))])
        center = jnp.mean(pts2, axis=0, keepdims=True)
        rot = jnp.stack(
            [
                jnp.stack([jnp.cos(angles), -jnp.sin(angles)], axis=-1),
                jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1),
            ],
            axis=-2,
        )  # (n_angles+1, 2, 2)
        rotated = jnp.einsum("nc,acd->and", pts2 - center, rot) + center
        if cfg.allow_artifacts:
            valid = jnp.ones((angles.shape[0],), dtype=bool)
        else:
            valid = jnp.all((rotated >= 0.0) & (rotated < 1.0), axis=(1, 2))
            # identity rotation (last slot) always a fallback
            valid = valid.at[-1].set(True)
        pts2 = _masked_choice(k_rot_c, rotated, valid)

    shape_xy = jnp.array([width, height], dtype=jnp.float32)
    pts1_px = corners * shape_xy[None, :]
    pts2_px = pts2 * shape_xy[None, :]
    return homography_from_4pts(pts1_px, pts2_px)


def sample_homography_batch(
    key: jax.Array,
    batch: int,
    height: int,
    width: int,
    config: HomographyConfig = HomographyConfig(),
) -> jax.Array:
    """(B, 3, 3) stack of independent random homographies."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: sample_homography(k, height, width, config))(keys)
