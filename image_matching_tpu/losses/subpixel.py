"""Subpixel refinement losses (fixed-K masked formulation).

Parity: `subpixel_loss` / `subpixel_loss_no_argmax`
(utils/losses.py:132-203): at each labelled keypoint, compare the GT
subpixel residual against either the soft-argmax of a heatmap patch
around the point, or a directly-predicted 2-channel residual map. The
reference extracts dynamic point lists with `nonzero` + torchvision
roi_pool; here the keypoints arrive as fixed-K masked (xy, residual)
arrays and the patch gather is ops/sampling.extract_patches.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from image_matching_tpu.ops.sampling import extract_patches, soft_argmax_2d


@partial(jax.jit, static_argnames=("patch_size",))
def subpixel_loss(
    xy: jax.Array,
    residuals: jax.Array,
    mask: jax.Array,
    pred_heatmap: jax.Array,
    patch_size: int = 7,
) -> jax.Array:
    """Mean L2 between GT residuals and patch soft-argmax offsets.

    Args:
      xy: (B, K, 2) integer keypoint locations.
      residuals: (B, K, 2) GT subpixel offsets at those keypoints.
      mask: (B, K) validity.
      pred_heatmap: (B, H, W, 1) predicted detector heatmap.
    """
    patches = extract_patches(pred_heatmap, xy, patch_size)  # (B, K, P, P)
    # log-patches with the reference's 1e-6 floor (do_log)
    log_patches = jnp.log(jnp.maximum(patches, 1e-6))
    center = (patch_size - 1) / 2.0
    dxdy = soft_argmax_2d(log_patches) - center  # (B, K, 2)
    err = jnp.linalg.norm(residuals - dxdy, axis=-1)
    w = mask.astype(jnp.float32)
    return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1.0)


@jax.jit
def subpixel_loss_no_argmax(
    xy: jax.Array,
    residuals: jax.Array,
    mask: jax.Array,
    pred_residual_map: jax.Array,
) -> jax.Array:
    """Mean L2 between GT residuals and a predicted 2-channel residual
    map sampled at the keypoints."""
    ix = jnp.round(xy[..., 0]).astype(jnp.int32)
    iy = jnp.round(xy[..., 1]).astype(jnp.int32)
    h, w = pred_residual_map.shape[1], pred_residual_map.shape[2]
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    pred = jax.vmap(lambda m, yy, xx: m[yy, xx])(pred_residual_map, iy, ix)
    err = jnp.linalg.norm(residuals - pred, axis=-1)
    wgt = mask.astype(jnp.float32)
    return jnp.sum(err * wgt) / jnp.maximum(jnp.sum(wgt), 1.0)
