"""Vectorized RANSAC vs OpenCV on synthetic correspondences with outliers."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops import fit_similarity_lsq, ransac_homography, ransac_similarity
from image_matching_tpu.ops.ransac import fit_homography_lsq, similarity_from_2pts


def make_similarity(angle, scale, tx, ty):
    c, s = np.cos(angle) * scale, np.sin(angle) * scale
    return np.array([[c, -s, tx], [s, c, ty]], dtype=np.float64)


def synth_matches(rng, mat, n_inliers=80, n_outliers=40, noise=0.5, homography=False):
    p0 = rng.uniform(0, 200, (n_inliers + n_outliers, 2))
    if homography:
        p1 = cv2.perspectiveTransform(p0[None].astype(np.float64), mat)[0]
    else:
        p1 = p0 @ mat[:, :2].T + mat[:, 2]
    p1 += rng.normal(0, noise, p1.shape)
    p1[n_inliers:] = rng.uniform(0, 200, (n_outliers, 2))  # gross outliers
    return p0.astype(np.float32), p1.astype(np.float32)


class TestSimilarityMinimal:
    def test_exact_on_2pts(self):
        mat = make_similarity(0.3, 1.2, 5.0, -3.0)
        p0 = np.array([[0.0, 0.0], [10.0, 4.0]])
        p1 = p0 @ mat[:, :2].T + mat[:, 2]
        est = np.asarray(similarity_from_2pts(jnp.asarray(p0), jnp.asarray(p1)))
        np.testing.assert_allclose(est, mat, rtol=1e-4, atol=1e-4)

    def test_lsq_recovers_with_noise(self):
        rng = np.random.default_rng(0)
        mat = make_similarity(-0.2, 0.9, 12.0, 7.0)
        p0, p1 = synth_matches(rng, mat, 100, 0, noise=0.3)
        est = np.asarray(
            fit_similarity_lsq(jnp.asarray(p0), jnp.asarray(p1), jnp.ones(100))
        )
        np.testing.assert_allclose(est, mat, atol=0.1)


class TestRansacSimilarity:
    def test_recovers_model_with_outliers(self):
        rng = np.random.default_rng(1)
        mat = make_similarity(0.4, 1.1, -20.0, 15.0)
        p0, p1 = synth_matches(rng, mat, 80, 60)
        fit = ransac_similarity(
            jax.random.PRNGKey(0),
            jnp.asarray(p0), jnp.asarray(p1), jnp.ones(140, bool),
            threshold=7.0,
        )
        assert bool(fit.valid)
        assert int(fit.num_inliers) >= 75
        np.testing.assert_allclose(np.asarray(fit.matrix), mat, atol=0.2)

    def test_comparable_to_cv2(self):
        rng = np.random.default_rng(2)
        mat = make_similarity(-0.6, 0.8, 30.0, -10.0)
        p0, p1 = synth_matches(rng, mat, 60, 60, noise=1.0)
        fit = ransac_similarity(
            jax.random.PRNGKey(1),
            jnp.asarray(p0), jnp.asarray(p1), jnp.ones(120, bool),
            threshold=7.0,
        )
        ref, ref_inl = cv2.estimateAffinePartial2D(
            p0, p1, method=cv2.RANSAC, ransacReprojThreshold=7
        )
        np.testing.assert_allclose(np.asarray(fit.matrix), ref, atol=0.3)
        assert abs(int(fit.num_inliers) - int(ref_inl.sum())) <= 5

    def test_invalid_when_too_few(self):
        p0 = jnp.zeros((10, 2))
        p1 = jnp.zeros((10, 2))
        valid = jnp.zeros(10, bool).at[0].set(True).at[1].set(True)
        fit = ransac_similarity(jax.random.PRNGKey(0), p0, p1, valid)
        assert not bool(fit.valid)
        assert int(fit.num_inliers) == 0

    def test_respects_match_mask(self):
        # valid matches follow the model; masked-out slots are adversarial
        rng = np.random.default_rng(3)
        mat = make_similarity(0.1, 1.0, 3.0, 4.0)
        p0, p1 = synth_matches(rng, mat, 50, 0, noise=0.2)
        bad0 = rng.uniform(0, 200, (50, 2)).astype(np.float32)
        bad1 = rng.uniform(0, 200, (50, 2)).astype(np.float32)
        P0 = jnp.asarray(np.concatenate([p0, bad0]))
        P1 = jnp.asarray(np.concatenate([p1, bad1]))
        valid = jnp.asarray(np.array([True] * 50 + [False] * 50))
        fit = ransac_similarity(jax.random.PRNGKey(2), P0, P1, valid, threshold=5.0)
        assert bool(fit.valid)
        assert not bool(jnp.any(fit.inliers[50:]))
        np.testing.assert_allclose(np.asarray(fit.matrix), mat, atol=0.2)


class TestRansacHomography:
    def test_recovers_homography(self):
        rng = np.random.default_rng(4)
        h = np.array(
            [[1.1, 0.05, -10.0], [-0.03, 0.95, 20.0], [1e-4, -5e-5, 1.0]]
        )
        p0, p1 = synth_matches(rng, h, 80, 50, noise=0.5, homography=True)
        fit = ransac_homography(
            jax.random.PRNGKey(3),
            jnp.asarray(p0), jnp.asarray(p1), jnp.ones(130, bool),
            threshold=5.0,
        )
        assert bool(fit.valid)
        assert int(fit.num_inliers) >= 70
        est = np.asarray(fit.matrix)
        # compare action on test points rather than raw entries
        q = rng.uniform(0, 200, (50, 2)).astype(np.float64)
        ref_w = cv2.perspectiveTransform(q[None], h)[0]
        est_w = cv2.perspectiveTransform(q[None], est.astype(np.float64))[0]
        assert np.abs(ref_w - est_w).max() < 2.0

    def test_dlt_lsq_noise_free(self):
        rng = np.random.default_rng(5)
        h = np.array([[0.9, 0.1, 5.0], [0.0, 1.05, -8.0], [5e-5, 1e-4, 1.0]])
        p0 = rng.uniform(0, 100, (40, 2))
        p1 = cv2.perspectiveTransform(p0[None], h)[0]
        est = np.asarray(
            fit_homography_lsq(
                jnp.asarray(p0.astype(np.float32)),
                jnp.asarray(p1.astype(np.float32)),
                jnp.ones(40),
            )
        )
        np.testing.assert_allclose(est / est[2, 2], h, rtol=1e-2, atol=1e-2)


class TestIRLSPolish:
    """LO-RANSAC-style IRLS polish (polish_iters) must tighten the fit
    when inlier noise is heteroscedastic (the SuperGlue regime: many
    matches, a tail of borderline 2-5 px ones)."""

    def _mixed_noise_matches(self, rng, mat, n_precise=60, n_sloppy=40,
                             n_outliers=30):
        p0 = rng.uniform(0, 200, (n_precise + n_sloppy + n_outliers, 2))
        p1 = p0 @ mat[:, :2].T + mat[:, 2]
        p1[:n_precise] += rng.normal(0, 0.3, (n_precise, 2))
        p1[n_precise:n_precise + n_sloppy] += rng.normal(0, 3.0, (n_sloppy, 2))
        p1[n_precise + n_sloppy:] = rng.uniform(0, 200, (n_outliers, 2))
        return p0.astype(np.float32), p1.astype(np.float32)

    def test_polish_reduces_corner_error(self):
        mat = make_similarity(0.2, 1.05, 12.0, -7.0)
        corners = np.array([[0, 0], [200, 0], [0, 200], [200, 200]], np.float64)
        errs = {0: [], 2: []}
        rng = np.random.default_rng(11)
        for trial in range(8):
            p0, p1 = self._mixed_noise_matches(rng, mat)
            for iters in (0, 2):
                fit = ransac_similarity(
                    jax.random.PRNGKey(trial), jnp.asarray(p0),
                    jnp.asarray(p1), jnp.ones(130, bool),
                    threshold=7.0, polish_iters=iters,
                )
                est = np.asarray(fit.matrix, np.float64)
                e = np.linalg.norm(
                    corners @ est[:, :2].T + est[:, 2]
                    - (corners @ mat[:, :2].T + mat[:, 2]), axis=-1,
                ).mean()
                errs[iters].append(e)
        assert np.mean(errs[2]) < np.mean(errs[0])

    def test_polish_noop_on_clean_data(self):
        mat = make_similarity(-0.1, 0.95, 3.0, 8.0)
        rng = np.random.default_rng(12)
        p0, p1 = synth_matches(rng, mat, 80, 30, noise=0.0)
        fit0 = ransac_similarity(
            jax.random.PRNGKey(0), jnp.asarray(p0), jnp.asarray(p1),
            jnp.ones(110, bool), threshold=7.0, polish_iters=0,
        )
        fit2 = ransac_similarity(
            jax.random.PRNGKey(0), jnp.asarray(p0), jnp.asarray(p1),
            jnp.ones(110, bool), threshold=7.0, polish_iters=2,
        )
        np.testing.assert_allclose(
            np.asarray(fit2.matrix), np.asarray(fit0.matrix), atol=1e-4
        )

    def test_homography_polish_reduces_error(self):
        h = np.array(
            [[1.05, 0.08, -6.0], [-0.02, 0.98, 11.0], [8e-5, -4e-5, 1.0]]
        )
        rng = np.random.default_rng(13)
        corners = np.array([[0, 0], [200, 0], [0, 200], [200, 200]], np.float64)
        errs = {0: [], 2: []}
        for trial in range(6):
            p0 = rng.uniform(0, 200, (130, 2))
            p1 = cv2.perspectiveTransform(p0[None], h)[0]
            p1[:60] += rng.normal(0, 0.3, (60, 2))
            p1[60:100] += rng.normal(0, 3.0, (40, 2))
            p1[100:] = rng.uniform(0, 200, (30, 2))
            for iters in (0, 2):
                fit = ransac_homography(
                    jax.random.PRNGKey(trial),
                    jnp.asarray(p0.astype(np.float32)),
                    jnp.asarray(p1.astype(np.float32)),
                    jnp.ones(130, bool), threshold=7.0, polish_iters=iters,
                )
                est = np.asarray(fit.matrix, np.float64)
                e = np.abs(
                    cv2.perspectiveTransform(corners[None], est)[0]
                    - cv2.perspectiveTransform(corners[None], h)[0]
                ).max()
                errs[iters].append(e)
        assert np.mean(errs[2]) < np.mean(errs[0])


class TestConfidenceWeighting:
    """Optional per-match confidence weights (SuperGlue scores -> RANSAC)."""

    def _corner_err(self, est, mat):
        corners = np.array(
            [[0, 0], [200, 0], [0, 200], [200, 200]], dtype=np.float64
        )
        pred = corners @ np.asarray(est)[:, :2].T + np.asarray(est)[:, 2]
        gt = corners @ mat[:, :2].T + mat[:, 2]
        return float(np.mean(np.linalg.norm(pred - gt, axis=-1)))

    def test_weights_downweight_sloppy_inliers(self):
        # 40 precise matches (high confidence) + 80 matches with ~4 px
        # noise (low confidence): all are within the 7 px threshold, so
        # unweighted LSQ is dominated by the sloppy majority. Confidence
        # weighting must recover a tighter transform.
        rng = np.random.default_rng(7)
        mat = make_similarity(0.25, 1.05, 14.0, -9.0)
        p0 = rng.uniform(0, 200, (120, 2))
        p1 = p0 @ mat[:, :2].T + mat[:, 2]
        p1[:40] += rng.normal(0, 0.1, (40, 2))
        p1[40:] += rng.normal(0, 4.0, (80, 2))
        conf = np.full(120, 0.05, np.float32)
        conf[:40] = 0.95
        valid = jnp.ones(120, bool)
        args = (jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32), valid)
        fit_u = ransac_similarity(jax.random.PRNGKey(0), *args, threshold=7.0)
        fit_w = ransac_similarity(
            jax.random.PRNGKey(0), *args, threshold=7.0,
            weights=jnp.asarray(conf),
        )
        assert bool(fit_w.valid)
        err_u = self._corner_err(fit_u.matrix, mat)
        err_w = self._corner_err(fit_w.matrix, mat)
        assert err_w < err_u
        assert err_w < 0.5

    def test_uniform_weights_match_unweighted(self):
        rng = np.random.default_rng(8)
        mat = make_similarity(-0.3, 0.95, 5.0, 22.0)
        p0, p1 = synth_matches(rng, mat, 80, 40)
        valid = jnp.ones(120, bool)
        args = (jnp.asarray(p0), jnp.asarray(p1), valid)
        fit_u = ransac_similarity(jax.random.PRNGKey(3), *args, threshold=7.0)
        fit_w = ransac_similarity(
            jax.random.PRNGKey(3), *args, threshold=7.0,
            weights=jnp.full(120, 0.6),
        )
        # constant confidence = same sampling distribution + scale-invariant
        # LSQ weights -> same fit (up to the 1e-6 ridge term's scale)
        np.testing.assert_allclose(
            np.asarray(fit_u.matrix), np.asarray(fit_w.matrix), atol=1e-3
        )

    def test_homography_weights(self):
        rng = np.random.default_rng(9)
        h = np.array(
            [[1.05, 0.04, -12.0], [-0.03, 0.97, 8.0], [1e-4, -8e-5, 1.0]]
        )
        p0, p1 = synth_matches(rng, h, 60, 30, noise=0.2, homography=True)
        conf = np.full(90, 0.9, np.float32)
        conf[60:] = 0.05
        fit = ransac_homography(
            jax.random.PRNGKey(1),
            jnp.asarray(p0), jnp.asarray(p1), jnp.ones(90, bool),
            threshold=7.0, weights=jnp.asarray(conf),
        )
        assert bool(fit.valid)
        assert int(fit.num_inliers) >= 55
