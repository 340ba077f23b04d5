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


class TestHardRegimePairs:
    def test_perspective_gt_consistency(self):
        """source must equal template warped by the 3x3 gt homography."""
        import cv2

        rng = np.random.default_rng(2)
        pairs = make_eval_pairs(
            rng, 2, 120, 160, max_shift=8.0,
            gt_model="perspective", max_perspective=12.0,
        )
        for p in pairs:
            assert p.gt_matrix.shape == (3, 3)
            re_warp = cv2.warpPerspective(
                p.template[..., 0], p.gt_matrix.astype(np.float64), (160, 120)
            )
            interior = np.s_[20:-20, 20:-20]
            diff = re_warp[interior] - p.source[..., 0][interior]
            assert np.abs(diff).mean() < 1e-5

    def test_perspective_is_nonaffine(self):
        """corner jitter must produce a genuinely projective transform."""
        rng = np.random.default_rng(3)
        pairs = make_eval_pairs(
            rng, 4, 240, 320, gt_model="perspective", max_perspective=24.0
        )
        bottom_rows = np.stack([p.gt_matrix[2, :2] for p in pairs])
        assert np.abs(bottom_rows).max() > 1e-6

    def test_photo_asym_changes_source_only(self):
        rng_a = np.random.default_rng(4)
        rng_b = np.random.default_rng(4)
        plain = make_eval_pairs(rng_a, 1, 120, 160, texture="photo")
        # same draws for geometry/texture, then extra photometric draws
        asym = make_eval_pairs(rng_b, 1, 120, 160, texture="photo",
                               photo_asym=True)
        np.testing.assert_array_equal(plain[0].template, asym[0].template)
        np.testing.assert_array_equal(plain[0].gt_matrix, asym[0].gt_matrix)
        diff = np.abs(plain[0].source - asym[0].source).mean()
        assert diff > 1e-3  # photometric gap is material
        assert asym[0].source.min() >= 0.0 and asym[0].source.max() <= 1.0

    def test_corner_error_with_3x3_gt(self):
        h = np.float32([[1, 0, 2], [0, 1, 0], [0, 0, 1]])
        np.testing.assert_allclose(corner_error(h, h, 50, 50), 0.0, atol=1e-6)
        a = np.float32([[1, 0, 0], [0, 1, 0]])
        np.testing.assert_allclose(corner_error(a, h, 50, 50), 2.0, rtol=1e-5)


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
