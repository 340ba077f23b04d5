"""Heatmap → fixed-K keypoint extraction (static shapes, jittable).

Replaces the reference's dynamic pipeline of `torch.nonzero` threshold →
`remove_borders` → `top_k_keypoints`
(superpoint/models/superpoint_test.py:24-52,133-149), which forces a
host sync per image. Here: border + threshold masking happens on the
dense heatmap, then one `lax.top_k` yields a fixed-capacity masked
`Keypoints` set that flows through matching and RANSAC without ever
leaving the device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from image_matching_tpu.ops.nms import simple_nms
from image_matching_tpu.structs import Keypoints


@partial(
    jax.jit,
    static_argnames=("max_keypoints", "nms_radius", "border", "nms_iterations"),
)
def detect_keypoints(
    heatmap: jax.Array,
    max_keypoints: int,
    threshold: float = 0.005,
    nms_radius: int = 4,
    border: int = 4,
    nms_iterations: int = 2,
) -> Keypoints:
    """Extract the top-K scoring NMS survivors from a dense heatmap.

    Args:
      heatmap: (B, H, W) or (B, H, W, 1) detector scores in [0, 1].
      max_keypoints: K, the fixed capacity of the output set.
      threshold: keypoint confidence threshold (reference default 0.005,
        superpoint_flann_test.py:25).
      nms_radius: suppression radius (reference default 4).
      border: border_remove margin (superpoint_test.py:133: 4 px).

    Returns:
      Keypoints with xy (B, K, 2) float32 (x, y), score (B, K),
      mask (B, K) — slots below threshold (or beyond the true count) are
      masked out with score 0 and xy clamped to a real pixel.
    """
    if heatmap.ndim == 4:
        heatmap = heatmap[..., 0]
    b, h, w = heatmap.shape

    scores = simple_nms(heatmap, nms_radius, nms_iterations)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    border_ok = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    scores = jnp.where(border_ok[None], scores, 0.0)

    flat = scores.reshape(b, h * w)
    top_scores, top_idx = jax.lax.top_k(flat, max_keypoints)
    yy = (top_idx // w).astype(jnp.float32)
    xx = (top_idx % w).astype(jnp.float32)
    xy = jnp.stack([xx, yy], axis=-1)
    mask = top_scores > threshold
    return Keypoints(
        xy=xy,
        score=jnp.where(mask, top_scores, 0.0),
        mask=mask,
    )
