"""On-device training-batch construction: labels, warped pairs, masks.

The reference builds all of this per-sample in dataloader workers
(datasets/ALLSS.py:177-249: scatter pseudo-label points to maps, sample
a pair homography, inverse-warp the image, splat warped labels
bilinearly, compute eroded valid masks, photometric-augment). Here one
jitted function does it for the whole batch on the TPU, fed only by the
host's (image, points, mask) arrays — the augmentation pipeline is part
of the compiled step, not a CPU bottleneck.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from image_matching_tpu.data.photometric import PhotometricConfig, photometric_augment
from image_matching_tpu.geometry.homography import (
    HomographyConfig,
    invert_homography,
    sample_homography_batch,
    warp_points,
)
from image_matching_tpu.geometry.labels import splat_points_bilinear, scatter_points
from image_matching_tpu.geometry.warp import compute_valid_mask, warp_image


class WarpedPairConfig(NamedTuple):
    """Defaults mirror superpoint_allss_train_heatmap.yaml:33-45."""

    homography: HomographyConfig = HomographyConfig(
        scaling_amplitude=0.2,
        perspective_amplitude_x=0.2,
        perspective_amplitude_y=0.2,
        patch_ratio=0.85,
        max_angle=1.57,
        allow_artifacts=True,
    )
    valid_border_margin: int = 3
    photometric: PhotometricConfig = PhotometricConfig()
    gaussian_label_sigma: float = 0.2  # gaussian_label.params (yaml:8-10)


def _labels_from_points(xy, mask, height, width, sigma):
    """Scatter points to a (H, W) map; optional gaussian soft labels."""
    hard = jax.vmap(lambda p, m: scatter_points(p, m, height, width))(xy, mask)
    if sigma <= 0:
        return hard[..., None]
    radius = max(1, int(3 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    m = hard[:, None]  # (B, 1, H, W)
    m = jax.lax.conv_general_dilated(m, g[None, None, :, None], (1, 1), "SAME")
    m = jax.lax.conv_general_dilated(m, g[None, None, None, :], (1, 1), "SAME")
    soft = m[:, 0] / jnp.maximum(m.max(axis=(1, 2, 3), keepdims=True)[:, 0], 1e-6)
    return soft[..., None]


@partial(jax.jit, static_argnames=("cfg", "augment"))
def make_warped_pair_batch(
    key: jax.Array,
    images: jax.Array,
    points: jax.Array,
    points_mask: jax.Array,
    cfg: WarpedPairConfig = WarpedPairConfig(),
    augment: bool = True,
) -> dict:
    """(images, pseudo-label points) → full SuperPoint training batch.

    Args:
      images: (B, H, W, 1) float32 [0, 1].
      points: (B, K, 2) pseudo-label keypoints (x, y).
      points_mask: (B, K) validity.

    Returns dict with image/labels_2d/valid_mask, warped_image/
    warped_labels/warped_valid_mask, homographies (img→warped frame).
    """
    b, h, w, _ = images.shape
    k_h, k_aug0, k_aug1 = jax.random.split(key, 3)

    hs = sample_homography_batch(k_h, b, h, w, cfg.homography)
    h_inv = invert_homography(hs)

    warped = warp_image(images, h_inv)
    wxy = warp_points(points, hs)
    in_bounds = (
        (wxy[..., 0] >= 0) & (wxy[..., 0] <= w - 1)
        & (wxy[..., 1] >= 0) & (wxy[..., 1] <= h - 1)
    )
    wmask = points_mask & in_bounds

    labels = _labels_from_points(
        points, points_mask, h, w, cfg.gaussian_label_sigma
    )
    warped_labels_hard = jax.vmap(
        lambda p, m: splat_points_bilinear(p, m, h, w)
    )(wxy, wmask)[..., None]
    if cfg.gaussian_label_sigma > 0:
        warped_labels = _labels_from_points(
            wxy, wmask, h, w, cfg.gaussian_label_sigma
        )
    else:
        warped_labels = warped_labels_hard

    valid = jnp.ones((b, h, w), jnp.float32)[..., None]
    wvalid = compute_valid_mask(
        h_inv, h, w, erosion_radius=cfg.valid_border_margin
    )[..., None]

    img_out = images
    warped_out = warped
    if augment and cfg.photometric.enable:
        img_out = photometric_augment(k_aug0, images, cfg.photometric)
        warped_out = photometric_augment(k_aug1, warped, cfg.photometric)

    return {
        "image": img_out,
        "labels_2d": labels,
        "valid_mask": valid,
        "warped_image": warped_out,
        "warped_labels": warped_labels,
        "warped_valid_mask": wvalid,
        "homographies": hs,
    }
