"""Classical registration pipelines: SIFT and ORB detect→match→RANSAC.

Parity: `Traditional/registration.py` — `SIFT_REGIS` (resize→gray→SIFT→
FLANN 2-NN ratio 0.7→estimateAffinePartial2D RANSAC thresh 7, lines
6-49) and `ORB_REGIS` (ORB→BFMatcher Hamming cross-check→same RANSAC,
lines 51-88), with `MIN_MATCH_COUNT = 10` (line 4). Here each pipeline
is one jitted program over the framework's JAX detectors and matchers.
"""
from __future__ import annotations

import jax

from image_matching_tpu.features.orb import ORBConfig, orb_detect_and_describe
from image_matching_tpu.features.sift import SIFTConfig, sift_detect_and_describe
from image_matching_tpu.ops.matching import (
    gather_matched_points,
    match_hamming,
    match_ratio_mutual,
)
from image_matching_tpu.ops.ransac import ransac_similarity
from image_matching_tpu.registration import RegistrationResult

MIN_MATCH_COUNT = 10  # Traditional/registration.py:4


def build_classical_registration_fn(
    method: str = "sift",
    ratio: float = 0.7,
    ransac_model: str = "similarity",  # "similarity" | "homography"
    ransac_threshold: float = 7.0,
    num_hypotheses: int = 512,
    sift_config: SIFTConfig = SIFTConfig(),
    orb_config: ORBConfig = ORBConfig(),
):
    """Returns jittable `register(image0, image1, key) -> RegistrationResult`
    for single images (H, W, 1)."""

    def register(image0: jax.Array, image1: jax.Array, key: jax.Array):
        if method == "sift":
            kp0 = sift_detect_and_describe(image0, sift_config)
            kp1 = sift_detect_and_describe(image1, sift_config)
            matches = match_ratio_mutual(
                kp0.desc, kp1.desc, kp0.mask, kp1.mask,
                ratio=ratio, cross_check=False,
            )
        elif method == "orb":
            kp0 = orb_detect_and_describe(image0, orb_config)
            kp1 = orb_detect_and_describe(image1, orb_config)
            matches = match_hamming(kp0.desc, kp1.desc, kp0.mask, kp1.mask)
        else:
            raise ValueError(f"unknown method: {method}")

        p0, p1, valid = gather_matched_points(kp0.xy, kp1.xy, matches)
        from image_matching_tpu.ops.ransac import ransac_homography

        ransac = (
            ransac_similarity if ransac_model == "similarity"
            else ransac_homography
        )
        fit = ransac(
            key, p0, p1, valid,
            threshold=ransac_threshold,
            num_hypotheses=num_hypotheses,
            min_matches=MIN_MATCH_COUNT,
        )
        return RegistrationResult(
            kpts0=kp0, kpts1=kp1, matches=matches, fit=fit, warped=None
        )

    return register
