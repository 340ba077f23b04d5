"""Sparse contrastive descriptor loss — vectorized over the batch.

Parity: `descriptor_loss_sparse` + `batch_descriptor_loss_sparse`
(superpoint/loss_functions/sparse_loss.py:98-174) with
`PixelwiseContrastiveLoss.match_loss` / `non_match_descriptor_loss`
(pixelwise_contrastive_loss.py:131-251) and the perturbed random negative
sampler (`create_non_correspondences`,
superpoint/correspondence_tools/correspondence_finder.py:191-320).

The reference loops over batch elements in Python
(sparse_loss.py:161-174, a noted hot spot in SURVEY.md §3.4); here the
whole computation is one vmapped, jitted program with static shapes:
instead of filter+crop/pad-with-replacement over in-bounds matches, a
random-priority top-k picks `num_matching_attempts` slots and invalid
slots carry zero weight.

Semantics (training config superpoint_allss_train_heatmap.yaml:70-77):
  * positives: all cells of image0, warped into image1's cell grid,
    rounded; cos hinge max(0, 1 - <d_a, d_b>), mean over matches;
  * negatives: `num_masked_non_matches_per_match` random cells per
    match, perturbed away (σ=10) when they land within 1 cell of the
    true match, wrap-around; cos hinge max(0, <d_a, d_bn> - 0.2),
    summed and divided by (num_hard_negatives + 1);
  * total = lamda_d · match_loss + non_match_loss.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def homography_to_cell_frame(h: jax.Array, cell_size: int = 8) -> jax.Array:
    """Full-resolution pixel homography → cell-grid-frame homography:
    H_c = S · H · S⁻¹ with S = diag(1/s, 1/s, 1)."""
    s = float(cell_size)
    scale = jnp.array([[1 / s, 0, 0], [0, 1 / s, 0], [0, 0, 1.0]], h.dtype)
    scale_inv = jnp.array([[s, 0, 0], [0, s, 0], [0, 0, 1.0]], h.dtype)
    return scale @ h @ scale_inv


def _cell_coords(hc: int, wc: int) -> jax.Array:
    ys, xs = jnp.meshgrid(jnp.arange(hc), jnp.arange(wc), indexing="ij")
    return jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(jnp.float32)


def _gather_cells(desc: jax.Array, uv: jax.Array) -> jax.Array:
    """desc (Hc, Wc, D), uv (..., 2) integer (x, y) → (..., D)."""
    wc = desc.shape[1]
    flat = desc.reshape(-1, desc.shape[-1])
    idx = (uv[..., 1].astype(jnp.int32) * wc + uv[..., 0].astype(jnp.int32))
    idx = jnp.clip(idx, 0, flat.shape[0] - 1)
    return flat[idx]


def _one_image_loss(
    key,
    desc_a,  # (Hc, Wc, D)
    desc_b,
    h_cell,  # (3, 3) cell-frame homography a→b
    num_matches: int,
    num_non_matches: int,
    lamda_d: float,
    margin_pos: float,
    margin_neg: float,
):
    from image_matching_tpu.geometry.homography import warp_points

    hc, wc, _ = desc_a.shape
    k_sel, k_neg, k_pert_sign, k_pert_mag = jax.random.split(key, 4)

    uv_a = _cell_coords(hc, wc)  # (N, 2)
    uv_b = jnp.round(warp_points(uv_a, h_cell))
    inb = (
        (uv_b[:, 0] >= 0)
        & (uv_b[:, 0] <= wc - 1)
        & (uv_b[:, 1] >= 0)
        & (uv_b[:, 1] <= hc - 1)
    )

    # choose num_matches slots among the in-bounds warps: random-priority
    # top-k when the grid is large enough, sampling with replacement when
    # num_matches exceeds the cell count (the reference pads by random
    # choice with replacement, crop_or_pad_choice utils/utils.py:334-356)
    n_cells = uv_a.shape[0]
    if num_matches <= n_cells:
        prio = jnp.where(inb, jax.random.uniform(k_sel, (n_cells,)), -1.0)
        _, sel = jax.lax.top_k(prio, num_matches)
    else:
        logits = jnp.where(inb, 0.0, -jnp.inf)
        any_inb = jnp.any(inb)
        safe_logits = jnp.where(any_inb, logits, jnp.zeros_like(logits))
        sel = jax.random.categorical(k_sel, safe_logits, shape=(num_matches,))
    uv_a_m = uv_a[sel]
    uv_b_m = uv_b[sel]
    w = inb[sel].astype(jnp.float32)  # (num_matches,)
    n_valid = jnp.maximum(jnp.sum(w), 1.0)

    da = _gather_cells(desc_a, uv_a_m).astype(jnp.float32)
    db = _gather_cells(desc_b, uv_b_m).astype(jnp.float32)
    pos_sim = jnp.sum(da * db, axis=-1)
    match_loss = jnp.sum(jnp.maximum(margin_pos - pos_sim, 0.0) * w) / n_valid

    # --- negatives: random cells, perturbed away from the true match ---
    neg = jax.random.randint(
        k_neg, (num_matches, num_non_matches, 2), 0,
        jnp.array([wc, hc]),
    ).astype(jnp.float32)
    diff = jnp.abs(neg - uv_b_m[:, None, :])
    too_close = (diff[..., 0] < 1.0) | (diff[..., 1] < 1.0)
    sign = (
        jnp.floor(jax.random.uniform(k_pert_sign, too_close.shape) * 2.0) - 0.5
    )  # ±0.5 minimal perturbation
    magnitude = jax.random.normal(k_pert_mag, too_close.shape) * 10.0 + sign
    perturb = jnp.where(too_close, magnitude, 0.0)
    neg = neg + perturb[..., None]  # same scalar added to u and v (as ref)
    # wrap-around out-of-bounds (reference's shift-by-(size-1) wrap)
    for axis, upper in ((0, wc - 1.0), (1, hc - 1.0)):
        v = neg[..., axis]
        v = jnp.where(v > upper, v - upper, v)
        v = jnp.where(v < 0.0, v + upper, v)
        neg = neg.at[..., axis].set(v)
    neg = jnp.clip(jnp.floor(neg), 0, jnp.array([wc - 1, hc - 1], jnp.float32))

    dbn = _gather_cells(desc_b, neg).astype(jnp.float32)  # (M, NN, D)
    neg_sim = jnp.einsum("md,mnd->mn", da, dbn)
    neg_hinge = jnp.maximum(neg_sim - margin_neg, 0.0) * w[:, None]
    num_hard = jnp.sum(neg_hinge > 0.0)
    non_match_loss = jnp.sum(neg_hinge) / (num_hard + 1.0)

    return lamda_d * match_loss, non_match_loss


@partial(
    jax.jit,
    static_argnames=(
        "num_matching_attempts",
        "num_masked_non_matches_per_match",
        "cell_size",
    ),
)
def sparse_descriptor_loss(
    key: jax.Array,
    desc0: jax.Array,
    desc1: jax.Array,
    homographies: jax.Array,
    num_matching_attempts: int = 1000,
    num_masked_non_matches_per_match: int = 100,
    lamda_d: float = 1.0,
    margin_pos: float = 1.0,
    margin_neg: float = 0.2,
    cell_size: int = 8,
):
    """Batched sparse descriptor loss.

    Args:
      desc0, desc1: (B, Hc, Wc, D) unit-norm coarse descriptor maps for
        the image and its warped pair.
      homographies: (B, 3, 3) full-res pixel homographies image0→image1.

    Returns (total, pos, neg) scalar losses (batch means).
    """
    b = desc0.shape[0]
    keys = jax.random.split(key, b)
    h_cell = jax.vmap(lambda h: homography_to_cell_frame(h, cell_size))(homographies)
    pos, neg = jax.vmap(
        lambda k, da, db, h: _one_image_loss(
            k, da, db, h,
            num_matching_attempts,
            num_masked_non_matches_per_match,
            lamda_d, margin_pos, margin_neg,
        )
    )(keys, desc0, desc1, h_cell)
    return jnp.mean(pos + neg), jnp.mean(pos), jnp.mean(neg)
