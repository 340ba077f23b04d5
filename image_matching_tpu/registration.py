"""End-to-end registration pipelines: one jitted program per config.

Re-designs the reference's eval scripts as single XLA programs:
  * SuperPoint + ratio-KNN + RANSAC  ≙ superpoint_flann_test.py:15-119
  * SuperPoint + SuperGlue + RANSAC  ≙ superpoint_glue_test.py:15-140
The reference round-trips device→host between every stage (nonzero,
FLANN, cv2 RANSAC, warpAffine); here the image pair goes in and the
similarity/homography + warped image come out of one compiled function.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from image_matching_tpu.geometry.homography import invert_homography
from image_matching_tpu.geometry.warp import warp_image
from image_matching_tpu.models.matching import Matching
from image_matching_tpu.models.superglue import match_result_from_outputs
from image_matching_tpu.ops.matching import (
    gather_matched_points,
    match_ratio_mutual,
)
from image_matching_tpu.ops.ransac import ransac_homography, ransac_similarity
from image_matching_tpu.structs import Keypoints, MatchResult, RobustFit


@struct.dataclass
class RegistrationResult:
    kpts0: Keypoints
    kpts1: Keypoints
    matches: MatchResult
    fit: RobustFit
    warped: Optional[jax.Array] = None  # image0 warped into image1's frame


def affine_to_homography(mat23: jax.Array) -> jax.Array:
    last = jnp.broadcast_to(
        jnp.array([[0.0, 0.0, 1.0]], mat23.dtype), mat23.shape[:-2] + (1, 3)
    )
    return jnp.concatenate([mat23, last], axis=-2)


def rescale_transform(mat: jax.Array, scale: float) -> jax.Array:
    """Transform estimated at `resize_scale` → full-resolution transform.

    The reference only rescales the translation column
    (traditional.py:35-36, superpoint_glue_test.py:96-97), which is exact
    for transforms estimated on uniformly scaled images:
    T_full = S^-1 · T · S with S = diag(s, s, 1)."""
    if mat.shape[-2:] == (2, 3):
        return mat.at[..., :, 2].divide(scale)
    s = jnp.array([[scale, 0, 0], [0, scale, 0], [0, 0, 1.0]], mat.dtype)
    s_inv = jnp.array(
        [[1.0 / scale, 0, 0], [0, 1.0 / scale, 0], [0, 0, 1.0]], mat.dtype
    )
    out = s_inv @ mat @ s
    return out / out[..., 2:3, 2:3]


def _fit_and_warp(kpts0, kpts1, matches, image0, key, *,
                  ransac_model, ransac_threshold, num_hypotheses,
                  min_match_count, produce_warp, match_weights=None):
    p0, p1, valid = jax.vmap(gather_matched_points)(kpts0.xy, kpts1.xy, matches)

    ransac = ransac_similarity if ransac_model == "similarity" else ransac_homography
    keys = jax.random.split(key, p0.shape[0])
    if match_weights is None:
        fit = jax.vmap(
            lambda k, a, b, v: ransac(
                k, a, b, v,
                threshold=ransac_threshold,
                num_hypotheses=num_hypotheses,
                min_matches=min_match_count,
            )
        )(keys, p0, p1, valid)
    else:
        fit = jax.vmap(
            lambda k, a, b, v, w: ransac(
                k, a, b, v,
                threshold=ransac_threshold,
                num_hypotheses=num_hypotheses,
                min_matches=min_match_count,
                weights=w,
            )
        )(keys, p0, p1, valid, match_weights)

    warped = None
    if produce_warp:
        mat = fit.matrix
        h = affine_to_homography(mat) if ransac_model == "similarity" else mat
        # out(p) = image0(H^-1 p): image0 rendered into image1's frame
        warped = warp_image(image0, invert_homography(h))
    return fit, warped


def build_registration_fn(
    model: Matching,
    matcher: str = "ratio",  # "ratio" | "superglue"
    ratio: float = 0.7,
    ransac_model: str = "similarity",  # "similarity" | "homography"
    ransac_threshold: float = 7.0,
    num_hypotheses: int = 512,
    min_match_count: int = 10,  # MIN_MATCH_COUNT, registration.py:4
    produce_warp: bool = True,
    confidence_weighting: bool = True,
    confidence_gamma: float = 1.0,
    sg_ratio_gate: float = 0.0,
):
    """Returns a jittable `register(variables, image0, image1, key)`.

    Images: (B, H, W, 1) float32 in [0, 1].

    `confidence_weighting` (superglue matcher only): feed SuperGlue's
    calibrated per-match confidences into RANSAC — confidence-biased
    hypothesis sampling and confidence-scaled refit/IRLS weights
    (ops/ransac.py). SuperGlue produces more matches than ratio-NN but
    with a wider localisation-quality spread; unweighted LSQ lets the
    low-confidence tail drag the transform. The ratio matcher's raw
    cosine scores are not calibrated, so it always fits unweighted
    (like the reference's cv2 RANSAC, superpoint_flann_test.py:84)."""

    def register(variables, image0, image1, key) -> RegistrationResult:
        kpts0 = model.apply(variables, image0, method=model.detect)
        kpts1 = model.apply(variables, image1, method=model.detect)

        if matcher == "ratio":
            matches = match_ratio_mutual(
                kpts0.desc, kpts1.desc, kpts0.mask, kpts1.mask,
                ratio=ratio, cross_check=False,
            )
        elif matcher == "superglue":
            shape0 = (image0.shape[1], image0.shape[2])
            shape1 = (image1.shape[1], image1.shape[2])
            out = model.apply(
                variables, kpts0, kpts1, shape0, shape1,
                method=Matching.match_keypoints,
            )
            matches = match_result_from_outputs(out)
            if sg_ratio_gate > 0.0:
                # hybrid gate: drop SuperGlue assignments whose
                # descriptor distance does not beat the best alternative
                # by the (loose) Lowe ratio `sg_ratio_gate` — keeps the
                # GNN's context-validated extras while rejecting the
                # descriptor-ambiguous tail (ops/matching.py:
                # ratio_gate_matches)
                from image_matching_tpu.ops.matching import (
                    ratio_gate_matches,
                )

                matches = ratio_gate_matches(
                    matches, kpts0.desc, kpts1.desc, kpts0.mask,
                    kpts1.mask, gate=sg_ratio_gate,
                )
        else:
            raise ValueError(f"unknown matcher: {matcher}")

        match_weights = None
        if confidence_weighting and matcher == "superglue":
            # gamma > 1 sharpens: concentrates hypothesis sampling and
            # LSQ weight on the most confident matches
            match_weights = jnp.where(
                matches.matches0 >= 0, matches.scores0, 0.0
            ).astype(jnp.float32) ** confidence_gamma
        fit, warped = _fit_and_warp(
            kpts0, kpts1, matches, image0, key,
            ransac_model=ransac_model,
            ransac_threshold=ransac_threshold,
            num_hypotheses=num_hypotheses,
            min_match_count=min_match_count,
            produce_warp=produce_warp,
            match_weights=match_weights,
        )
        return RegistrationResult(
            kpts0=kpts0, kpts1=kpts1, matches=matches, fit=fit, warped=warped
        )

    return register


def reprojection_error(
    fit: RobustFit, p0: jax.Array, p1: jax.Array, valid: jax.Array
) -> jax.Array:
    """Mean symmetric reprojection error of a fit over valid matches (px)."""
    mat = fit.matrix
    if mat.shape[-2:] == (2, 3):
        pred = (
            jnp.einsum("...ij,...nj->...ni", mat[..., :, :2], p0)
            + mat[..., None, :, 2]
        )
    else:
        from image_matching_tpu.geometry.homography import warp_points

        pred = warp_points(p0, mat)
    err = jnp.sqrt(jnp.sum((pred - p1) ** 2, axis=-1))
    w = (valid & fit.inliers).astype(jnp.float32)
    return jnp.sum(err * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)
