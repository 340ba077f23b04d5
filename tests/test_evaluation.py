"""Evaluation harness unit tests."""
import jax
import numpy as np

from image_matching_tpu.evaluation import (
    corner_error,
    evaluate_pipeline,
    make_eval_pairs,
)
from image_matching_tpu.features.registration import build_classical_registration_fn


class TestCornerError:
    def test_zero_for_identical(self):
        mat = np.float32([[1.01, 0.02, 5.0], [-0.02, 1.01, -3.0]])
        assert corner_error(mat, mat, 100, 100) == 0.0

    def test_translation_offset(self):
        a = np.float32([[1, 0, 0], [0, 1, 0]])
        b = np.float32([[1, 0, 3], [0, 1, 4]])
        np.testing.assert_allclose(corner_error(a, b, 50, 50), 5.0, rtol=1e-6)

    def test_homography_input(self):
        h = np.float32([[1, 0, 2], [0, 1, 0], [0, 0, 1]])
        a = np.float32([[1, 0, 0], [0, 1, 0]])
        np.testing.assert_allclose(corner_error(h, a, 50, 50), 2.0, rtol=1e-5)


class TestMakePairs:
    def test_pair_consistency(self):
        """source must equal template warped by gt (away from borders)."""
        import cv2

        rng = np.random.default_rng(0)
        pairs = make_eval_pairs(rng, 2, 120, 160, max_shift=10.0)
        for p in pairs:
            re_warp = cv2.warpAffine(
                p.template[..., 0], p.gt_matrix, (160, 120)
            )
            interior = np.s_[20:-20, 20:-20]
            diff = re_warp[interior] - p.source[..., 0][interior]
            assert np.abs(diff).mean() < 1e-5


class TestEvaluatePipeline:
    def test_sift_on_easy_pairs(self):
        rng = np.random.default_rng(1)
        pairs = make_eval_pairs(
            rng, 4, 160, 160, max_angle=0.1, max_shift=10.0, texture="noise"
        )
        fn = jax.jit(build_classical_registration_fn("sift"))
        res = evaluate_pipeline(fn, pairs, jax.random.PRNGKey(0), success_px=5.0)
        assert res["n_pairs"] == 4
        assert res["success_rate"] >= 0.75
        assert res["mean_corner_err_px"] < 3.0
