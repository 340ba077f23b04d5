"""Descriptor sampling at keypoints, patch extraction, soft-argmax.

Parity targets: `sample_descriptors`
(superpoint/models/superpoint_test.py:40-52 — bilinear grid_sample on the
Hc×Wc descriptor map + L2 normalise), patch extraction + `soft_argmax_2d`
subpixel refinement (utils/losses.py:41-122,
superpoint/models/model_wrap.py:146-176). All gathers, all static shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from image_matching_tpu.geometry.warp import bilinear_sample
from image_matching_tpu.structs import Keypoints


@partial(jax.jit, static_argnames=("cell",))
def sample_descriptors(
    xy: jax.Array, desc_map: jax.Array, cell: int = 8
) -> jax.Array:
    """Bilinearly interpolate coarse descriptors at full-res keypoints.

    Uses the reference's exact coordinate normalisation
    (superpoint_test.py:44-47): n = (p - s/2 + 0.5) / (s*size_c - s/2 - 0.5)
    * 2 - 1, then align_corners=True bilinear sampling, then L2-normalise.

    Args:
      xy: (B, K, 2) keypoint (x, y) in full-resolution pixels.
      desc_map: (B, Hc, Wc, D) coarse descriptor map.
      cell: the stride s between descriptor cells (8).

    Returns: (B, K, D) unit-norm descriptors.
    """
    _, hc, wc, _ = desc_map.shape
    s = float(cell)
    size = jnp.array([wc, hc], dtype=jnp.float32)  # (x, y) order
    n = (xy - s / 2 + 0.5) / (size * s - s / 2 - 0.5) * 2.0 - 1.0
    # align_corners=True: normalized -> coarse pixel coords
    pc = (n + 1.0) / 2.0 * (size - 1.0)

    desc = jax.vmap(bilinear_sample)(desc_map, pc)  # (B, K, D)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    return desc / jnp.maximum(norm, 1e-12)


def describe_keypoints(
    kpts: Keypoints, desc_map: jax.Array, cell: int = 8
) -> Keypoints:
    """Attach sampled descriptors to a keypoint set (invalid slots zeroed)."""
    desc = sample_descriptors(kpts.xy, desc_map, cell)
    desc = desc * kpts.mask[..., None].astype(desc.dtype)
    return kpts.replace(desc=desc)


@partial(jax.jit, static_argnames=("patch_size",))
def extract_patches(
    image: jax.Array, xy: jax.Array, patch_size: int = 5
) -> jax.Array:
    """Gather `patch_size`² patches centred at integer-rounded keypoints.

    image: (B, H, W) or (B, H, W, 1); xy: (B, K, 2).
    Returns (B, K, P, P) float32. Out-of-bounds taps read 0 — equivalent
    to the roi_pool patch gather at utils/losses.py:41-108.
    """
    if image.ndim == 4:
        image = image[..., 0]
    r = patch_size // 2
    dy, dx = jnp.meshgrid(
        jnp.arange(-r, patch_size - r), jnp.arange(-r, patch_size - r), indexing="ij"
    )
    offsets = jnp.stack([dx, dy], axis=-1).reshape(-1, 2).astype(jnp.float32)
    centers = jnp.round(xy)[:, :, None, :]  # (B, K, 1, 2)
    coords = centers + offsets[None, None]  # (B, K, P*P, 2)

    patches = jax.vmap(bilinear_sample)(image[..., None], coords)[..., 0]
    return patches.reshape(xy.shape[0], xy.shape[1], patch_size, patch_size)


@jax.jit
def soft_argmax_2d(patches: jax.Array) -> jax.Array:
    """Spatial soft-argmax over (..., P, P) patches.

    Returns (..., 2) expected (x, y) in patch coordinates [0, P-1] — the
    10-line JAX replacement for torchgeometry's SpatialSoftArgmax2d
    (utils/losses.py:111-122).
    """
    *lead, ph, pw = patches.shape
    flat = patches.reshape(*lead, ph * pw)
    prob = jax.nn.softmax(flat, axis=-1).reshape(*lead, ph, pw)
    ys = jnp.arange(ph, dtype=patches.dtype)
    xs = jnp.arange(pw, dtype=patches.dtype)
    ey = jnp.sum(prob * ys[:, None], axis=(-2, -1))
    ex = jnp.sum(prob * xs[None, :], axis=(-2, -1))
    return jnp.stack([ex, ey], axis=-1)


@partial(jax.jit, static_argnames=("patch_size",))
def refine_keypoints_subpixel(
    heatmap: jax.Array, xy: jax.Array, patch_size: int = 5
) -> jax.Array:
    """Subpixel refinement: log-patch soft-argmax around each keypoint.

    Mirrors `soft_argmax_points` (model_wrap.py:146-176): extract a
    patch from the heatmap, take log (with the reference's 1e-6 floor,
    utils/losses.py:124-130), soft-argmax, and shift by the offset from
    the patch centre.
    """
    patches = extract_patches(heatmap, xy, patch_size)
    log_patches = jnp.log(patches + 1e-6)
    sub = soft_argmax_2d(log_patches)
    center = (patch_size - 1) / 2.0
    return jnp.round(xy) + (sub - center)
