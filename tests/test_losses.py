"""Loss tests, including the reference's own analytic invariant:
identity homography + identical descriptors ⇒ zero positive loss
(the smoke block at sparse_loss.py:176-219)."""
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.losses import (
    cell_mask_from_2d,
    detector_loss,
    homography_to_cell_frame,
    make_gt_matches,
    sparse_descriptor_loss,
    superglue_nll_loss,
)
from image_matching_tpu.geometry.labels import labels_2d_to_3d


class TestDetectorLoss:
    def _labels(self, rng, b=2, h=32, w=32, n=20):
        lab = np.zeros((b, h, w, 1), np.float32)
        for bi in range(b):
            ys = rng.integers(0, h, n)
            xs = rng.integers(0, w, n)
            lab[bi, ys, xs, 0] = 1.0
        return jnp.asarray(lab)

    def test_perfect_prediction_near_zero(self):
        # one keypoint per cell: targets are binary, so BCE can reach 0
        lab = np.zeros((1, 32, 32, 1), np.float32)
        for cy in range(4):
            for cx in range(4):
                lab[0, cy * 8 + 3, cx * 8 + 5, 0] = 1.0
        labels = jnp.asarray(lab)
        target = labels_2d_to_3d(labels, 8, add_dustbin=True)
        # logits that softmax to ~the target distribution
        semi = 20.0 * target
        mask = jnp.ones((1, 32, 32, 1))
        loss = detector_loss(semi, labels, mask)
        assert float(loss) < 0.05

    def test_wrong_prediction_larger(self):
        rng = np.random.default_rng(1)
        labels = self._labels(rng)
        mask = jnp.ones((2, 32, 32, 1))
        good = detector_loss(
            20.0 * labels_2d_to_3d(labels, 8, True), labels, mask
        )
        # peaked on the dustbin everywhere
        wrong = jnp.zeros((2, 4, 4, 65)).at[..., -1].set(20.0)
        bad = detector_loss(wrong, labels, mask)
        assert float(bad) > float(good) + 1.0

    def test_mask_removes_region(self):
        rng = np.random.default_rng(2)
        labels = self._labels(rng)
        semi = jnp.asarray(rng.normal(size=(2, 4, 4, 65)).astype(np.float32))
        full = jnp.ones((2, 32, 32, 1))
        half = jnp.asarray(
            np.concatenate(
                [np.ones((2, 32, 16, 1)), np.zeros((2, 32, 16, 1))], axis=2
            ).astype(np.float32)
        )
        l_full = detector_loss(semi, labels, full)
        l_half = detector_loss(semi, labels, half)
        assert not np.isclose(float(l_full), float(l_half))

    def test_cell_mask_all_pixels_required(self):
        m = jnp.ones((1, 16, 16, 1)).at[0, 3, 3, 0].set(0.0)
        cm = np.asarray(cell_mask_from_2d(m, 8))
        assert cm[0, 0, 0] == 0.0 and cm[0, 0, 1] == 1.0


class TestSparseDescriptorLoss:
    def test_identity_and_equal_descriptors_zero_positive(self):
        rng = np.random.default_rng(3)
        d = rng.normal(size=(2, 8, 10, 16)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d)
        hs = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        total, pos, neg = sparse_descriptor_loss(
            jax.random.PRNGKey(0), d, d, hs,
            num_matching_attempts=64, num_masked_non_matches_per_match=10,
        )
        assert float(pos) < 1e-5
        assert float(neg) >= 0.0
        assert np.isfinite(float(total))

    def test_mismatched_descriptors_positive_loss(self):
        rng = np.random.default_rng(4)
        d0 = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
        d1 = -d0  # opposite descriptors: cos = -1 → hinge = 2
        hs = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        _, pos, _ = sparse_descriptor_loss(
            jax.random.PRNGKey(1), jnp.asarray(d0), jnp.asarray(d1), hs,
            num_matching_attempts=64, num_masked_non_matches_per_match=4,
        )
        np.testing.assert_allclose(float(pos), 2.0, rtol=1e-3)

    def test_gradients_flow(self):
        rng = np.random.default_rng(5)
        d0 = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
        hs = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))

        def f(d):
            t, _, _ = sparse_descriptor_loss(
                jax.random.PRNGKey(2), d, d * 0.9, hs,
                num_matching_attempts=32, num_masked_non_matches_per_match=4,
            )
            return t

        g = jax.grad(f)(d0)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_cell_frame_conversion(self):
        h = jnp.asarray(
            np.array([[1.0, 0, 16.0], [0, 1.0, -8.0], [0, 0, 1]], np.float32)
        )
        hc = np.asarray(homography_to_cell_frame(h, 8))
        np.testing.assert_allclose(hc[:2, 2], [2.0, -1.0])


class TestSuperGlueLoss:
    def test_make_gt_matches_simple(self):
        xy0w = jnp.asarray(
            np.array([[[10.0, 10], [50, 50], [90, 90], [0, 0]]], np.float32)
        )
        xy1 = jnp.asarray(
            np.array([[[11.0, 10], [49, 51], [200, 200], [0, 0]]], np.float32)
        )
        mask0 = jnp.asarray(np.array([[True, True, True, False]]))
        mask1 = jnp.asarray(np.array([[True, True, True, False]]))
        gt0, gt1 = make_gt_matches(xy0w, xy1, mask0, mask1, dist_thresh=3.0)
        g0 = np.asarray(gt0[0])
        g1 = np.asarray(gt1[0])
        assert g0[0] == 0 and g0[1] == 1  # close pairs matched
        assert g0[2] == 4  # far -> dustbin (K1=4)
        assert g0[3] == 4  # invalid -> dustbin
        assert g1[0] == 0 and g1[1] == 1
        assert g1[2] == 4  # unmatched kpt1 -> dustbin (K0=4)

    def test_nll_prefers_correct_coupling(self):
        k = 5
        # GT: identity matching
        gt0 = jnp.asarray(np.arange(k, dtype=np.int32)[None])
        gt1 = jnp.asarray(np.arange(k, dtype=np.int32)[None])
        mask = jnp.ones((1, k), bool)
        good = np.full((1, k + 1, k + 1), -10.0, np.float32)
        for i in range(k):
            good[0, i, i] = -0.01
        bad = np.full((1, k + 1, k + 1), -np.log(k + 1), np.float32)
        l_good = superglue_nll_loss(jnp.asarray(good), gt0, gt1, mask, mask)
        l_bad = superglue_nll_loss(jnp.asarray(bad), gt0, gt1, mask, mask)
        assert float(l_good) < float(l_bad)

    def test_dustbin_pairs_counted(self):
        k = 4
        gt0 = jnp.asarray(np.array([[0, 4, 4, 4]], np.int32))  # 1 match, 3 dustbin
        gt1 = jnp.asarray(np.array([[0, 4, 4, 4]], np.int32))
        mask = jnp.ones((1, k), bool)
        z = jnp.asarray(np.full((1, k + 1, k + 1), -1.0, np.float32))
        loss = superglue_nll_loss(z, gt0, gt1, mask, mask)
        # 4 pairs from set0 + 3 unmatched from set1, all -z = 1.0
        np.testing.assert_allclose(float(loss), 1.0, rtol=1e-6)
