"""SuperGlue NLL training loss — one gather + mean, no Python loops.

Parity: the reference computes `-log P[x, y]` over GT correspondence
pairs with a Python for-loop restricted to batch size 1
(superglue/models/superglue_train.py:288-299, a SURVEY.md §3.5 hot
spot); GT pairs include dustbin assignments for unmatched points
(GlueSparse.py:63-82). Here the GT is two fixed-K index arrays and the
loss is a batched gather from the (M+1)×(N+1) log-coupling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make_gt_matches(
    xy0_warped_to1: jax.Array,
    xy1: jax.Array,
    mask0: jax.Array,
    mask1: jax.Array,
    dist_thresh: float = 3.0,
):
    """Build GT assignment from geometry, like GlueSparse.py:63-82:
    mutual nearest neighbours of the warped keypoints within
    `dist_thresh` px are matches; everything else goes to the dustbin.

    Args:
      xy0_warped_to1: (B, K0, 2) keypoints of image0 warped into image1.
      xy1: (B, K1, 2) keypoints of image1.

    Returns:
      gt0: (B, K0) int32 in [0, K1] — column index, K1 = dustbin.
      gt1: (B, K1) int32 in [0, K0] — row index, K0 = dustbin.
    """
    k0, k1 = xy0_warped_to1.shape[-2], xy1.shape[-2]
    d2 = jnp.sum(
        (xy0_warped_to1[..., :, None, :] - xy1[..., None, :, :]) ** 2, axis=-1
    )  # (B, K0, K1)
    big = 1e12
    valid = mask0[..., :, None] & mask1[..., None, :]
    d2 = jnp.where(valid, d2, big)

    best1 = jnp.argmin(d2, axis=-1)  # (B, K0)
    best0 = jnp.argmin(d2, axis=-2)  # (B, K1)
    dmin = jnp.min(d2, axis=-1)
    mutual = jnp.take_along_axis(best0, best1, axis=-1) == jnp.arange(k0)
    is_match0 = mutual & (dmin < dist_thresh**2) & mask0

    gt0 = jnp.where(is_match0, best1, k1).astype(jnp.int32)
    gt0 = jnp.where(mask0, gt0, k1)

    # invert for set 1
    is_match1 = jnp.zeros(best0.shape, dtype=bool)
    scatter_tgt = jnp.where(is_match0, best1, k1)

    def one(tgt, src_valid):
        out = jnp.full((k1 + 1,), k0, dtype=jnp.int32)
        out = out.at[tgt].set(
            jnp.where(src_valid, jnp.arange(k0, dtype=jnp.int32), k0)
        )
        return out[:k1]

    gt1 = jax.vmap(one)(scatter_tgt, is_match0)
    del is_match1
    return gt0, gt1


def superglue_nll_loss(
    log_coupling: jax.Array,
    gt0: jax.Array,
    gt1: jax.Array,
    mask0: jax.Array,
    mask1: jax.Array,
) -> jax.Array:
    """Mean −log P over GT pairs, including dustbin assignments.

    Counted pairs (matching the reference's all_matches construction):
      * (i, gt0[i]) for every valid keypoint i of set 0 (matched or
        dustbin-assigned), and
      * (dustbin_row, j) for every valid-but-unmatched keypoint j of
        set 1 (matched ones are already counted from set 0's side).
    """
    b, mp1, np1 = log_coupling.shape
    m, n = mp1 - 1, np1 - 1

    z0 = jnp.take_along_axis(
        log_coupling[:, :m, :], gt0[..., None], axis=-1
    )[..., 0]  # (B, K0)
    loss0 = -z0 * mask0.astype(jnp.float32)

    unmatched1 = (gt1 == m) & mask1
    z1 = log_coupling[:, m, :n]  # dustbin row
    loss1 = -z1 * unmatched1.astype(jnp.float32)

    count = jnp.sum(mask0) + jnp.sum(unmatched1)
    return (jnp.sum(loss0) + jnp.sum(loss1)) / jnp.maximum(count, 1.0)
