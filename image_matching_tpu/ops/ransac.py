"""Vectorized-hypothesis RANSAC in pure XLA.

Replaces OpenCV's `estimateAffinePartial2D(method=RANSAC, thresh=7)`
(Traditional/registration.py:35,74; superpoint_flann_test.py:84;
superpoint_glue_test.py:88) and `findHomography`. OpenCV's loop is
data-dependent (adaptive iteration count, early exit); on TPU we instead
draw a *fixed budget* of minimal samples, solve every hypothesis in one
vmap, score all hypotheses against all correspondences with one
broadcasted residual computation, argmax the consensus, and refit on the
winning inlier set with least squares. Degenerate samples are scored 0.

Model types:
  * similarity ("partial affine", 4 DOF) — minimal sample 2 points,
    closed-form complex-ratio solve.
  * homography (8 DOF) — minimal sample 4 points, DLT solve.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from image_matching_tpu.geometry.homography import homography_from_4pts, warp_points
from image_matching_tpu.structs import RobustFit


def _sample_indices(key, valid, num_hyp, sample_size, weights=None):
    """(M, k) indices drawn from valid slots (with replacement).

    With `weights` (match confidences), minimal samples are drawn
    proportionally to confidence (PROSAC-flavoured): hypotheses come
    from the matches most likely to be correct, so the consensus search
    wastes fewer of its fixed budget on outlier-contaminated samples.
    """
    if weights is None:
        logits = jnp.where(valid, 0.0, -jnp.inf)
    else:
        logits = jnp.where(valid, jnp.log(jnp.maximum(weights, 1e-6)), -jnp.inf)
    flat = jax.random.categorical(key, logits[None], shape=(num_hyp * sample_size,))
    return flat.reshape(num_hyp, sample_size)


def similarity_from_2pts(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """Exact similarity (scale+rot+trans) mapping 2 src pts to 2 dst pts.

    p0, p1: (..., 2, 2). Returns (..., 2, 3) with
    [[a, -b, tx], [b, a, ty]] — treat points as complex numbers; the
    similarity is (q2-q1)/(p2-p1) plus a translation.
    """
    dp = p0[..., 1, :] - p0[..., 0, :]
    dq = p1[..., 1, :] - p1[..., 0, :]
    den = dp[..., 0] ** 2 + dp[..., 1] ** 2
    den = jnp.maximum(den, 1e-12)
    a = (dq[..., 0] * dp[..., 0] + dq[..., 1] * dp[..., 1]) / den
    b = (dq[..., 1] * dp[..., 0] - dq[..., 0] * dp[..., 1]) / den
    tx = p1[..., 0, 0] - (a * p0[..., 0, 0] - b * p0[..., 0, 1])
    ty = p1[..., 0, 1] - (b * p0[..., 0, 0] + a * p0[..., 0, 1])
    row0 = jnp.stack([a, -b, tx], axis=-1)
    row1 = jnp.stack([b, a, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def fit_similarity_lsq(
    p0: jax.Array, p1: jax.Array, weights: jax.Array
) -> jax.Array:
    """Weighted least-squares similarity fit (the RANSAC polish step).

    p0, p1: (N, 2); weights: (N,). Solves for (a, b, tx, ty) via 4x4
    normal equations — x' = a·x - b·y + tx, y' = b·x + a·y + ty.
    """
    w = weights.astype(jnp.float32)
    x, y = p0[:, 0], p0[:, 1]
    u, v = p1[:, 0], p1[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows_x = jnp.stack([x, -y, one, zero], axis=-1)
    rows_y = jnp.stack([y, x, zero, one], axis=-1)
    a_mat = jnp.concatenate([rows_x, rows_y], axis=0)  # (2N, 4)
    b_vec = jnp.concatenate([u, v], axis=0)  # (2N,)
    ww = jnp.concatenate([w, w], axis=0)
    ata = (a_mat * ww[:, None]).T @ a_mat + 1e-6 * jnp.eye(4)
    atb = (a_mat * ww[:, None]).T @ b_vec
    z = jnp.linalg.solve(ata, atb)
    a, b, tx, ty = z[0], z[1], z[2], z[3]
    return jnp.stack(
        [jnp.stack([a, -b, tx]), jnp.stack([b, a, ty])], axis=0
    )


def _normalizing_transform(pts: jax.Array, weights: jax.Array) -> jax.Array:
    """Hartley normalisation: translate centroid to origin, mean dist √2."""
    w = weights[:, None]
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mean = jnp.sum(pts * w, axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, axis=-1, keepdims=True))
    mean_d = jnp.maximum(jnp.sum(d * w) / wsum, 1e-6)
    s = jnp.sqrt(2.0) / mean_d
    zero = jnp.zeros(())
    one = jnp.ones(())
    return jnp.stack(
        [
            jnp.stack([s, zero, -s * mean[0]]),
            jnp.stack([zero, s, -s * mean[1]]),
            jnp.stack([zero, zero, one]),
        ]
    )


def fit_homography_lsq(
    p0: jax.Array, p1: jax.Array, weights: jax.Array
) -> jax.Array:
    """Weighted DLT homography fit with Hartley normalisation.

    Fixes h33 = 1 (valid away from degenerate plane-at-infinity cases)
    so the solve is an 8x8 normal-equation system instead of an SVD —
    cheaper and TPU-friendly.
    """
    t0 = _normalizing_transform(p0, weights)
    t1 = _normalizing_transform(p1, weights)
    q0 = warp_points(p0, t0)
    q1 = warp_points(p1, t1)
    x, y = q0[:, 0], q0[:, 1]
    u, v = q1[:, 0], q1[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    ax = jnp.stack([x, y, one, zero, zero, zero, -x * u, -y * u], axis=-1)
    ay = jnp.stack([zero, zero, zero, x, y, one, -x * v, -y * v], axis=-1)
    a_mat = jnp.concatenate([ax, ay], axis=0)  # (2N, 8)
    b_vec = jnp.concatenate([u, v], axis=0)
    ww = jnp.concatenate([weights, weights], axis=0).astype(jnp.float32)
    ata = (a_mat * ww[:, None]).T @ a_mat + 1e-8 * jnp.eye(8)
    atb = (a_mat * ww[:, None]).T @ b_vec
    h8 = jnp.linalg.solve(ata, atb)
    h = jnp.concatenate([h8, jnp.ones((1,))]).reshape(3, 3)
    h = jnp.linalg.inv(t1) @ h @ t0
    return h / h[2, 2]


def _residuals_affine(mat, p0, p1):
    pred = jnp.einsum("...ij,nj->...ni", mat[..., :, :2], p0) + mat[..., None, :, 2]
    return jnp.sum((pred - p1[None]) ** 2, axis=-1)


def _consensus(res_sq, valid, thresh):
    """Inlier mask + MSAC-style score per hypothesis."""
    t2 = thresh * thresh
    inl = (res_sq < t2) & valid[None]
    # MSAC: truncated quadratic loss (lower = better fit)
    score = jnp.sum(jnp.where(inl, res_sq, t2) * valid[None], axis=-1)
    return inl, score


@partial(jax.jit, static_argnames=("num_hypotheses", "min_matches", "polish_iters"))
def ransac_similarity(
    key: jax.Array,
    p0: jax.Array,
    p1: jax.Array,
    valid: jax.Array,
    threshold: float = 7.0,
    num_hypotheses: int = 512,
    min_matches: int = 4,
    polish_iters: int = 2,
    weights: jax.Array | None = None,
) -> RobustFit:
    """Robust partial-affine (similarity) estimation.

    Args:
      key: PRNG key for hypothesis sampling.
      p0, p1: (N, 2) matched source/destination points.
      valid: (N,) bool mask of real correspondences.
      threshold: inlier reprojection threshold in px (reference uses 7).
      num_hypotheses: fixed hypothesis budget (vmapped, not looped).
      polish_iters: IRLS local-optimisation rounds after the inlier
        refit (LO-RANSAC-style): reweight by a Cauchy kernel at scale
        threshold/2 so borderline inliers stop dominating the LSQ.
        OpenCV's estimateAffinePartial2D refines similarly
        (refineIters); inlier SEMANTICS stay at the full threshold.
      weights: optional (N,) match confidences in (0, 1] — biases
        hypothesis sampling toward confident matches and scales the
        refit/IRLS weights, so low-confidence (but within-threshold)
        matches stop dragging the final LSQ. Inlier counting stays
        unweighted at the full threshold.

    Returns a `RobustFit` with a (2, 3) matrix. Batch with jax.vmap.
    """
    idx = _sample_indices(key, valid, num_hypotheses, 2, weights)  # (M, 2)
    s0 = p0[idx]  # (M, 2, 2)
    s1 = p1[idx]
    mats = similarity_from_2pts(s0, s1)  # (M, 2, 3)
    # degenerate: the two sample points (nearly) coincide
    degen = (
        jnp.sum((s0[:, 0] - s0[:, 1]) ** 2, axis=-1) < 1e-6
    ) | ~jnp.isfinite(mats).all(axis=(-2, -1))

    res = _residuals_affine(mats, p0, p1)  # (M, N)
    inl, msac = _consensus(res, valid, threshold)
    counts = jnp.sum(inl, axis=-1)
    counts = jnp.where(degen, -1, counts)
    # prefer max inliers, break ties by lower MSAC score
    order = counts.astype(jnp.float32) - msac / (msac.max() + 1.0)
    best = jnp.argmax(order)

    best_inl = inl[best]
    conf = jnp.ones_like(p0[:, 0]) if weights is None else weights
    refined = fit_similarity_lsq(p0, p1, best_inl.astype(jnp.float32) * conf)
    t2 = threshold * threshold
    sigma2 = t2 * 0.25
    for _ in range(polish_iters):
        res_r = _residuals_affine(refined[None], p0, p1)[0]
        w = jnp.where(
            (res_r < t2) & valid, conf / (1.0 + res_r / sigma2), 0.0
        )
        refined = fit_similarity_lsq(p0, p1, w)
    res_r = _residuals_affine(refined[None], p0, p1)[0]
    final_inl = (res_r < threshold * threshold) & valid
    n_inl = jnp.sum(final_inl)
    ok = (jnp.sum(valid) >= min_matches) & (n_inl >= min_matches)
    return RobustFit(
        matrix=jnp.where(ok, refined, jnp.eye(2, 3)),
        inliers=final_inl & ok,
        num_inliers=jnp.where(ok, n_inl, 0),
        valid=ok,
    )


def _residuals_homography(h, p0, p1):
    pred = warp_points(p0[None], h)
    return jnp.sum((pred - p1[None]) ** 2, axis=-1)


@partial(jax.jit, static_argnames=("num_hypotheses", "min_matches", "polish_iters"))
def ransac_homography(
    key: jax.Array,
    p0: jax.Array,
    p1: jax.Array,
    valid: jax.Array,
    threshold: float = 7.0,
    num_hypotheses: int = 512,
    min_matches: int = 6,
    polish_iters: int = 2,
    weights: jax.Array | None = None,
) -> RobustFit:
    """Robust homography estimation (4-point DLT hypotheses + DLT polish
    + IRLS local optimisation — see ransac_similarity: polish_iters and
    the optional confidence `weights`)."""
    idx = _sample_indices(key, valid, num_hypotheses, 4, weights)  # (M, 4)
    s0 = p0[idx]
    s1 = p1[idx]
    hs = homography_from_4pts(s0, s1)  # (M, 3, 3)
    # degeneracy: singular DLT (nan/inf) or near-coincident sample points
    pair_d = jnp.sum(
        (s0[:, :, None, :] - s0[:, None, :, :]) ** 2, axis=-1
    )  # (M, 4, 4)
    eye = jnp.eye(4, dtype=bool)
    degen = jnp.any(jnp.where(eye[None], jnp.inf, pair_d) < 1e-6, axis=(1, 2))
    degen = degen | ~jnp.isfinite(hs).all(axis=(-2, -1))
    hs = jnp.where(jnp.isfinite(hs).all(axis=(-2, -1))[:, None, None], hs, jnp.eye(3))

    res = _residuals_homography(hs, p0, p1)
    inl, msac = _consensus(res, valid, threshold)
    counts = jnp.sum(inl, axis=-1)
    counts = jnp.where(degen, -1, counts)
    order = counts.astype(jnp.float32) - msac / (msac.max() + 1.0)
    best = jnp.argmax(order)

    best_inl = inl[best]
    conf = jnp.ones_like(p0[:, 0]) if weights is None else weights
    refined = fit_homography_lsq(p0, p1, best_inl.astype(jnp.float32) * conf)
    t2 = threshold * threshold
    sigma2 = t2 * 0.25
    for _ in range(polish_iters):
        res_r = _residuals_homography(refined[None], p0, p1)[0]
        w = jnp.where(
            (res_r < t2) & valid, conf / (1.0 + res_r / sigma2), 0.0
        )
        refined = fit_homography_lsq(p0, p1, w)
    res_r = _residuals_homography(refined[None], p0, p1)[0]
    final_inl = (res_r < threshold * threshold) & valid
    n_inl = jnp.sum(final_inl)
    ok = (jnp.sum(valid) >= min_matches) & (n_inl >= min_matches)
    return RobustFit(
        matrix=jnp.where(ok, refined, jnp.eye(3)),
        inliers=final_inl & ok,
        num_inliers=jnp.where(ok, n_inl, 0),
        valid=ok,
    )
