"""Classical SIFT/ORB feature tests: detection sanity, matching under
known transforms, end-to-end classical registration."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_matching_tpu.features import (
    ORBConfig,
    SIFTConfig,
    orb_detect_and_describe,
    sift_detect_and_describe,
)
from image_matching_tpu.features.orb import fast_score
from image_matching_tpu.features.registration import build_classical_registration_fn
from image_matching_tpu.ops.matching import match_hamming, match_ratio_mutual


def blob_image(rng, h=128, w=128, n=25, invert_half=True):
    """Random bright blobs on dark background — strong DoG/FAST responses."""
    img = np.zeros((h, w), np.float32)
    for i in range(n):
        c = rng.uniform(16, min(h, w) - 16, 2)
        r = rng.uniform(2, 6)
        col = 1.0 if (i % 2 == 0 or not invert_half) else 0.6
        cv2.circle(img, (int(c[0]), int(c[1])), int(r), col, -1)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    return img


def checker_image(h=96, w=96, cell=12):
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (((ys // cell) + (xs // cell)) % 2).astype(np.float32)


class TestFAST:
    def test_detects_square_corners(self):
        img = np.zeros((64, 64), np.float32)
        img[20:44, 20:44] = 1.0
        score = np.asarray(fast_score(jnp.asarray(img), ORBConfig()))
        # corners respond, flat regions and straight edges don't
        assert score[20, 20] > 0 and score[43, 43] > 0
        assert score[32, 32] == 0  # interior
        assert score[20, 32] == 0  # edge midpoint (straight edge: arc < 9)

    def test_nms_and_capacity(self):
        rng = np.random.default_rng(0)
        img = blob_image(rng)
        kp = orb_detect_and_describe(jnp.asarray(img), ORBConfig(max_keypoints=64))
        assert kp.xy.shape == (64, 2)
        assert int(kp.num_valid()) > 5
        assert kp.desc.dtype == jnp.uint8 and kp.desc.shape == (64, 32)


class TestSIFTDetect:
    def test_finds_blobs(self):
        rng = np.random.default_rng(1)
        img = blob_image(rng, n=15)
        kp = sift_detect_and_describe(jnp.asarray(img), SIFTConfig(max_keypoints=256))
        assert int(kp.num_valid()) >= 10
        desc = np.asarray(kp.desc)[np.asarray(kp.mask)]
        np.testing.assert_allclose(np.linalg.norm(desc, axis=-1), 1.0, rtol=1e-3)

    def test_descriptor_shift_invariance(self):
        """Descriptors of the same content at shifted positions match."""
        rng = np.random.default_rng(2)
        img = blob_image(rng, n=20)
        shift = np.float32([[1, 0, 11], [0, 1, 7]])
        img2 = cv2.warpAffine(img, shift, (128, 128))
        kp0 = sift_detect_and_describe(jnp.asarray(img))
        kp1 = sift_detect_and_describe(jnp.asarray(img2))
        res = match_ratio_mutual(
            kp0.desc, kp1.desc, kp0.mask, kp1.mask, ratio=0.8, cross_check=True
        )
        m0 = np.asarray(res.matches0)
        xy0 = np.asarray(kp0.xy)
        xy1 = np.asarray(kp1.xy)
        disp = np.array([xy1[j] - xy0[i] for i, j in enumerate(m0) if j >= 0])
        assert len(disp) >= 8
        med = np.median(disp, axis=0)
        np.testing.assert_allclose(med, [11, 7], atol=1.5)


class TestORBMatching:
    def test_hamming_matches_shifted(self):
        rng = np.random.default_rng(3)
        img = blob_image(rng, n=30)
        shift = np.float32([[1, 0, 9], [0, 1, -6]])
        img2 = cv2.warpAffine(img, shift, (128, 128))
        kp0 = orb_detect_and_describe(jnp.asarray(img))
        kp1 = orb_detect_and_describe(jnp.asarray(img2))
        res = match_hamming(kp0.desc, kp1.desc, kp0.mask, kp1.mask)
        m0 = np.asarray(res.matches0)
        xy0 = np.asarray(kp0.xy)
        xy1 = np.asarray(kp1.xy)
        disp = np.array([xy1[j] - xy0[i] for i, j in enumerate(m0) if j >= 0])
        assert len(disp) >= 8
        good = np.abs(disp - np.array([9, -6])).max(-1) < 2
        assert good.mean() > 0.5  # majority of matches are correct


class TestClassicalRegistration:
    @pytest.mark.parametrize("method", ["sift", "orb"])
    def test_recovers_similarity(self, method):
        rng = np.random.default_rng(4)
        img = blob_image(rng, h=160, w=160, n=40)
        ang, sc, tx, ty = 0.08, 1.0, 12.0, -9.0
        c, s = np.cos(ang) * sc, np.sin(ang) * sc
        cx = cy = 80.0
        mat = np.float32(
            [[c, -s, tx + cx - c * cx + s * cy], [s, c, ty + cy - s * cx - c * cy]]
        )
        img2 = cv2.warpAffine(img, mat, (160, 160))

        register = jax.jit(build_classical_registration_fn(method))
        res = register(
            jnp.asarray(img[..., None]), jnp.asarray(img2[..., None]),
            jax.random.PRNGKey(0),
        )
        assert bool(res.fit.valid)
        est = np.asarray(res.fit.matrix)
        np.testing.assert_allclose(est[:, :2], mat[:, :2], atol=0.08)
        np.testing.assert_allclose(est[:, 2], mat[:, 2], atol=3.0)
