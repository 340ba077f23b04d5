"""Geometry core vs OpenCV/NumPy oracles (SURVEY.md §4 test strategy a)."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_matching_tpu.geometry import (
    compute_valid_mask,
    denormalize_points,
    homography_from_4pts,
    invert_homography,
    normalize_points,
    sample_homography,
    warp_image,
    warp_points,
)
from image_matching_tpu.geometry.homography import (
    HomographyConfig,
    sample_homography_batch,
)


def random_homography(rng, scale=0.15):
    """Small random perspective perturbation of identity, as numpy."""
    h = np.eye(3)
    h[:2, :2] += rng.uniform(-scale, scale, (2, 2))
    h[:2, 2] = rng.uniform(-10, 10, 2)
    h[2, :2] = rng.uniform(-1e-4, 1e-4, 2)
    return h


class TestWarpPoints:
    def test_matches_cv2_perspective_transform(self):
        rng = np.random.default_rng(0)
        h = random_homography(rng)
        pts = rng.uniform(0, 100, (50, 2)).astype(np.float32)
        ours = np.asarray(warp_points(jnp.asarray(pts), jnp.asarray(h)))
        ref = cv2.perspectiveTransform(pts[None], h)[0]
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)

    def test_batched(self):
        rng = np.random.default_rng(1)
        hs = np.stack([random_homography(rng) for _ in range(4)])
        pts = rng.uniform(0, 50, (4, 20, 2)).astype(np.float32)
        ours = np.asarray(warp_points(jnp.asarray(pts), jnp.asarray(hs)))
        for b in range(4):
            ref = cv2.perspectiveTransform(pts[b][None], hs[b])[0]
            np.testing.assert_allclose(ours[b], ref, rtol=1e-4, atol=1e-3)

    def test_identity_roundtrip_norm(self):
        pts = jnp.array([[0.0, 0.0], [31.0, 23.0], [10.0, 5.0]])
        n = normalize_points(pts, height=24, width=32)
        back = denormalize_points(n, height=24, width=32)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


class TestHomographySolve:
    def test_matches_cv2_get_perspective_transform(self):
        rng = np.random.default_rng(2)
        src = np.float32([[0, 0], [0, 99], [99, 99], [99, 0]])
        dst = src + rng.uniform(-20, 20, (4, 2)).astype(np.float32)
        ours = np.asarray(homography_from_4pts(jnp.asarray(src), jnp.asarray(dst)))
        ref = cv2.getPerspectiveTransform(src, dst)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)

    def test_inverse(self):
        rng = np.random.default_rng(3)
        h = jnp.asarray(random_homography(rng))
        hi = invert_homography(h)
        np.testing.assert_allclose(np.asarray(h @ hi), np.eye(3), atol=1e-5)


class TestWarpImage:
    def test_identity(self):
        rng = np.random.default_rng(4)
        img = jnp.asarray(rng.uniform(0, 1, (32, 40, 1)).astype(np.float32))
        out = warp_image(img, jnp.eye(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_matches_cv2_warp_perspective(self):
        rng = np.random.default_rng(5)
        img = rng.uniform(0, 1, (48, 64)).astype(np.float32)
        h = random_homography(rng, scale=0.05)
        # cv2.warpPerspective(img, H): out(p) = img(H^-1 p) -> ours with h_inv
        ref = cv2.warpPerspective(img, h, (64, 48), flags=cv2.INTER_LINEAR)
        ours = np.asarray(
            warp_image(jnp.asarray(img[..., None]), jnp.asarray(np.linalg.inv(h)))
        )[..., 0]
        # compare away from borders (border policies differ slightly)
        interior = np.s_[4:-4, 4:-4]
        diff = np.abs(ours[interior] - ref[interior])
        assert np.percentile(diff, 99) < 0.05
        assert diff.mean() < 5e-3

    def test_batched_matches_single(self):
        rng = np.random.default_rng(6)
        imgs = jnp.asarray(rng.uniform(0, 1, (3, 24, 24, 1)).astype(np.float32))
        hs = jnp.asarray(
            np.stack([random_homography(rng, 0.03) for _ in range(3)])
        ).astype(jnp.float32)
        batched = warp_image(imgs, hs)
        for b in range(3):
            single = warp_image(imgs[b], hs[b])
            np.testing.assert_allclose(
                np.asarray(batched[b]), np.asarray(single), atol=1e-5
            )


class TestValidMask:
    def test_identity_full(self):
        m = compute_valid_mask(jnp.eye(3), height=32, width=32)
        assert float(jnp.mean(m)) == 1.0

    def test_translation_cuts_mask(self):
        # destination pixel p reads source p + 8 in x -> last 8 columns invalid
        h_inv = jnp.asarray(np.array([[1, 0, 8.0], [0, 1, 0], [0, 0, 1]]))
        m = np.asarray(compute_valid_mask(h_inv, height=16, width=16))
        assert m[:, : 16 - 9].all()
        assert not m[:, -8:].any()

    def test_erosion_shrinks(self):
        h_inv = jnp.asarray(np.array([[1, 0, 4.0], [0, 1, 0], [0, 0, 1]]))
        m0 = compute_valid_mask(h_inv, 32, 32, erosion_radius=0)
        m3 = compute_valid_mask(h_inv, 32, 32, erosion_radius=3)
        assert float(jnp.sum(m3)) < float(jnp.sum(m0))


class TestSampleHomography:
    def test_jit_and_valid(self):
        key = jax.random.PRNGKey(0)
        fn = jax.jit(lambda k: sample_homography(k, 120, 160))
        h = np.asarray(fn(key))
        assert h.shape == (3, 3)
        assert np.isfinite(h).all()
        np.testing.assert_allclose(h[2, 2], 1.0, atol=1e-5)

    def test_patch_maps_inside_image(self):
        # warped image corners must land inside the original image when
        # artifacts are disallowed (definition of a valid patch homography)
        key = jax.random.PRNGKey(1)
        hs = sample_homography_batch(key, 64, 120, 160)
        corners = jnp.array([[0.0, 0.0], [0.0, 119.0], [159.0, 119.0], [159.0, 0.0]])
        warped = np.asarray(warp_points(corners[None], hs))
        assert (warped[..., 0] >= -1.0).all() and (warped[..., 0] <= 160.0).all()
        assert (warped[..., 1] >= -1.0).all() and (warped[..., 1] <= 120.0).all()

    def test_distinct_samples(self):
        key = jax.random.PRNGKey(2)
        hs = np.asarray(sample_homography_batch(key, 8, 120, 160))
        assert np.std(hs[:, 0, 2]) > 1.0  # translations vary

    def test_no_transforms_is_fixed_patch(self):
        cfg = HomographyConfig(
            perspective=False, scaling=False, rotation=False, translation=False
        )
        h = sample_homography(jax.random.PRNGKey(3), 100, 100, cfg)
        # maps full image to centered half-size patch
        c = warp_points(jnp.array([[0.0, 0.0], [99.0, 99.0]]), h)
        np.testing.assert_allclose(
            np.asarray(c), [[25.0, 25.0], [74.5, 74.5]], atol=0.5
        )
