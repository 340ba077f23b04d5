"""SuperPoint detector loss: BCE over per-cell softmax with dustbin labels.

Parity: `Train_model_heatmap.detector_loss` (Train_model_heatmap.py:72-81)
with labels from `labels2Dto3D(add_dustbin=True)` (utils/utils.py:456-468)
and the all-pixels-valid cell mask of `getMasks`
(Train_model_frontend.py:362-377). Supports soft (gaussian-blurred)
label maps exactly like the reference's gaussian_label mode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from image_matching_tpu.geometry.labels import labels_2d_to_3d, space_to_depth


def cell_mask_from_2d(mask_2d: jax.Array, cell_size: int = 8) -> jax.Array:
    """(B, H, W, 1) pixel validity → (B, Hc, Wc) cell validity.

    A cell is valid iff *every* pixel in it is valid (the reference's
    `torch.prod` over the space-to-depth channels)."""
    cells = space_to_depth(mask_2d, cell_size)  # (B, Hc, Wc, 64)
    return jnp.prod(cells, axis=-1)


def detector_loss(
    semi: jax.Array,
    labels_2d: jax.Array,
    valid_mask_2d: jax.Array,
    cell_size: int = 8,
) -> jax.Array:
    """Masked BCE between softmax(semi) and dustbin-augmented cell labels.

    Args:
      semi: (B, Hc, Wc, 65) raw detector logits.
      labels_2d: (B, H, W, 1) keypoint map (binary or gaussian-soft).
      valid_mask_2d: (B, H, W, 1) pixel validity.

    Returns scalar loss (sum over channels, masked mean over cells).
    """
    labels_3d = labels_2d_to_3d(labels_2d, cell_size, add_dustbin=True)
    mask = cell_mask_from_2d(valid_mask_2d, cell_size)  # (B, Hc, Wc)

    p = jax.nn.softmax(semi.astype(jnp.float32), axis=-1)
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    t = labels_3d.astype(jnp.float32)
    bce = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))  # (B, Hc, Wc, 65)
    per_cell = jnp.sum(bce, axis=-1)
    return jnp.sum(per_cell * mask) / (jnp.sum(mask) + 1e-10)
