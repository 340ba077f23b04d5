"""KNN / ratio / Hamming matchers vs OpenCV brute-force oracles."""
import cv2
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops import match_hamming, match_mutual_nn, match_ratio_mutual
from image_matching_tpu.ops.matching import gather_matched_points, pairwise_sqdist


def unit_descs(rng, n, d=32):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestPairwiseSqdist:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(5, 8)).astype(np.float32)
        b = rng.normal(size=(7, 8)).astype(np.float32)
        ours = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
        ref = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TestRatioMatcher:
    def test_matches_cv2_bf_knn_ratio(self):
        rng = np.random.default_rng(1)
        d1 = unit_descs(rng, 80)
        # second set: noisy copies of half of d1 + distractors
        noise = rng.normal(size=(40, 32)).astype(np.float32) * 0.05
        d2 = np.concatenate([d1[:40] + noise, unit_descs(rng, 40)])
        d2 = d2 / np.linalg.norm(d2, axis=-1, keepdims=True)

        res = match_ratio_mutual(
            jnp.asarray(d1), jnp.asarray(d2),
            jnp.ones(80, bool), jnp.ones(80, bool),
            ratio=0.7, cross_check=False,
        )
        ours = {
            (i, int(m)) for i, m in enumerate(np.asarray(res.matches0)) if m >= 0
        }

        bf = cv2.BFMatcher(cv2.NORM_L2)
        knn = bf.knnMatch(d1, d2, k=2)
        ref = {
            (m.queryIdx, m.trainIdx)
            for m, n in knn
            if m.distance < 0.7 * n.distance
        }
        assert ours == ref
        assert len(ref) > 20  # the planted correspondences are found

    def test_mask_excludes_slots(self):
        rng = np.random.default_rng(2)
        d = unit_descs(rng, 10)
        mask = jnp.asarray(np.array([True] * 5 + [False] * 5))
        res = match_ratio_mutual(
            jnp.asarray(d), jnp.asarray(d), mask, mask, ratio=0.9
        )
        m0 = np.asarray(res.matches0)
        assert (m0[5:] == -1).all()
        assert (m0[:5] == np.arange(5)).all()  # identical descs match themselves

    def test_matches1_inverse_consistency(self):
        rng = np.random.default_rng(3)
        d1 = unit_descs(rng, 30)
        d2 = unit_descs(rng, 25)
        res = match_ratio_mutual(
            jnp.asarray(d1), jnp.asarray(d2),
            jnp.ones(30, bool), jnp.ones(25, bool), ratio=0.95,
        )
        m0 = np.asarray(res.matches0)
        m1 = np.asarray(res.matches1)
        for i, j in enumerate(m0):
            if j >= 0:
                assert m1[j] == i


class TestMutualNN:
    def test_identical_sets_match_identity(self):
        rng = np.random.default_rng(4)
        d = unit_descs(rng, 16)
        res = match_mutual_nn(
            jnp.asarray(d), jnp.asarray(d), jnp.ones(16, bool), jnp.ones(16, bool)
        )
        assert (np.asarray(res.matches0) == np.arange(16)).all()

    def test_distance_threshold(self):
        rng = np.random.default_rng(5)
        d1 = unit_descs(rng, 8)
        d2 = -d1  # maximally far on the sphere (dist 2)
        res = match_mutual_nn(
            jnp.asarray(d1), jnp.asarray(d2),
            jnp.ones(8, bool), jnp.ones(8, bool), max_dist=0.7,
        )
        assert (np.asarray(res.matches0) == -1).all()


class TestHamming:
    def test_matches_cv2_bf_hamming_crosscheck(self):
        rng = np.random.default_rng(6)
        b1 = rng.integers(0, 256, (60, 32), dtype=np.uint8)
        flip = rng.integers(0, 256, (30, 32), dtype=np.uint8) & rng.integers(
            0, 256, (30, 32), dtype=np.uint8
        ) & rng.integers(0, 256, (30, 32), dtype=np.uint8)
        b2 = np.concatenate([b1[:30] ^ flip, rng.integers(0, 256, (30, 32), dtype=np.uint8)])

        res = match_hamming(
            jnp.asarray(b1), jnp.asarray(b2),
            jnp.ones(60, bool), jnp.ones(60, bool),
        )
        ours = {
            (i, int(m)) for i, m in enumerate(np.asarray(res.matches0)) if m >= 0
        }
        bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
        ref = {(m.queryIdx, m.trainIdx) for m in bf.match(b1, b2)}
        # cv2 cross-check keeps non-mutual ties differently; require near-equal
        assert len(ours & ref) / max(len(ref), 1) > 0.95

    def test_exact_copies_match(self):
        rng = np.random.default_rng(7)
        b = rng.integers(0, 256, (16, 32), dtype=np.uint8)
        res = match_hamming(
            jnp.asarray(b), jnp.asarray(b), jnp.ones(16, bool), jnp.ones(16, bool)
        )
        assert (np.asarray(res.matches0) == np.arange(16)).all()


class TestGatherMatched:
    def test_pairs(self):
        xy0 = jnp.arange(10, dtype=jnp.float32).reshape(5, 2)
        xy1 = jnp.arange(10, 22, dtype=jnp.float32).reshape(6, 2)
        rng = np.random.default_rng(8)
        d0 = unit_descs(rng, 5)
        res = match_mutual_nn(
            jnp.asarray(d0), jnp.asarray(np.concatenate([d0[2:], d0[:2]])),
            jnp.ones(5, bool), jnp.ones(5, bool),
        )
        p0, p1, valid = gather_matched_points(xy0, xy1[:5], res)
        m0 = np.asarray(res.matches0)
        for i in range(5):
            if valid[i]:
                np.testing.assert_allclose(
                    np.asarray(p1[i]), np.asarray(xy1[m0[i]])
                )
