"""Golden end-to-end registration tests on synthetic pairs with known GT
(SURVEY.md §4c). Works with an untrained net: a CNN is a deterministic
feature extractor, so a shifted image yields shifted detections with
near-identical descriptors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_matching_tpu.models.matching import Matching, MatchingConfig
from image_matching_tpu.registration import (
    affine_to_homography,
    build_registration_fn,
    rescale_transform,
)


def textured_image(rng, h=96, w=96):
    img = rng.uniform(0, 1, (h, w)).astype(np.float32)
    # box blur a couple of times to create blobs an untrained net can latch on
    k = np.ones((5, 5), np.float32) / 25
    import cv2

    for _ in range(2):
        img = cv2.filter2D(img, -1, k)
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return img


@pytest.fixture(scope="module")
def small_model():
    cfg = MatchingConfig(
        backbone="bn",
        descriptor_dim=64,
        max_keypoints=128,
        keypoint_threshold=0.0,
        keypoint_encoder=(32, 64),
        gnn_layers=2,
        sinkhorn_iterations=10,
        compute_dtype="float32",
    )
    model = Matching(cfg)
    img = jnp.zeros((1, 96, 96, 1))
    variables = model.init(jax.random.PRNGKey(0), img, img)
    return model, variables


class TestRegistrationPipeline:
    def test_recovers_translation(self, small_model):
        model, variables = small_model
        rng = np.random.default_rng(0)
        img0 = textured_image(rng)
        # untrained-net caveat: the near-uniform heatmap is only
        # translation-equivariant for multiples of the cell size (8), so
        # the golden transform uses cell-aligned shifts; content-driven
        # (trained) detection has no such restriction.
        tx, ty = 8.0, 16.0
        h_inv = jnp.asarray(
            np.array([[1, 0, -tx], [0, 1, -ty], [0, 0, 1]], np.float32)
        )
        from image_matching_tpu.geometry.warp import warp_image

        i0 = jnp.asarray(img0[None, :, :, None])
        i1 = warp_image(i0, jnp.broadcast_to(h_inv, (1, 3, 3)))

        register = jax.jit(
            build_registration_fn(
                model, matcher="ratio", ratio=0.9,
                ransac_threshold=3.0, min_match_count=6,
            )
        )
        res = register(variables, i0, i1, jax.random.PRNGKey(1))
        assert bool(res.fit.valid[0])
        assert int(res.fit.num_inliers[0]) >= 10
        mat = np.asarray(res.fit.matrix[0])
        np.testing.assert_allclose(mat[:, :2], np.eye(2), atol=0.05)
        np.testing.assert_allclose(mat[:, 2], [tx, ty], atol=1.0)

    def test_recovers_negative_translation(self, small_model):
        model, variables = small_model
        rng = np.random.default_rng(1)
        img0 = textured_image(rng)
        tx, ty = -16.0, 24.0  # cell-aligned (see note above)
        t = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float32)
        from image_matching_tpu.geometry.warp import warp_image

        i0 = jnp.asarray(img0[None, :, :, None])
        i1 = warp_image(i0, jnp.asarray(np.linalg.inv(t))[None])

        register = jax.jit(
            build_registration_fn(
                model, matcher="ratio", ratio=0.95,
                ransac_threshold=3.0, min_match_count=6, produce_warp=False,
            )
        )
        res = register(variables, i0, i1, jax.random.PRNGKey(2))
        assert bool(res.fit.valid[0])
        mat = np.asarray(res.fit.matrix[0])
        np.testing.assert_allclose(mat[:, :2], t[:2, :2], atol=0.05)
        np.testing.assert_allclose(mat[:, 2], t[:2, 2], atol=2.5)

    def test_superglue_path_runs(self, small_model):
        model, variables = small_model
        rng = np.random.default_rng(2)
        img0 = textured_image(rng)
        i0 = jnp.asarray(img0[None, :, :, None])
        register = jax.jit(
            build_registration_fn(model, matcher="superglue", produce_warp=False)
        )
        res = register(variables, i0, i0, jax.random.PRNGKey(3))
        assert res.matches.matches0.shape == (1, 128)

    def test_warped_output_aligns(self, small_model):
        model, variables = small_model
        rng = np.random.default_rng(3)
        img0 = textured_image(rng)
        h_inv = jnp.asarray(np.array([[1, 0, -8.0], [0, 1, -8.0], [0, 0, 1]], np.float32))
        from image_matching_tpu.geometry.warp import warp_image

        i0 = jnp.asarray(img0[None, :, :, None])
        i1 = warp_image(i0, jnp.broadcast_to(h_inv, (1, 3, 3)))
        register = jax.jit(
            build_registration_fn(model, matcher="ratio", ratio=0.9, ransac_threshold=3.0)
        )
        res = register(variables, i0, i1, jax.random.PRNGKey(4))
        w = np.asarray(res.warped[0, :, :, 0])
        tgt = np.asarray(i1[0, :, :, 0])
        interior = np.s_[12:-12, 12:-12]
        assert np.abs(w[interior] - tgt[interior]).mean() < 0.02


class TestTransformUtils:
    def test_rescale_affine(self):
        mat = jnp.asarray(np.array([[1.1, 0.1, 20.0], [-0.1, 1.1, -8.0]], np.float32))
        up = np.asarray(rescale_transform(mat, 0.5))
        np.testing.assert_allclose(up[:, :2], np.asarray(mat)[:, :2])
        np.testing.assert_allclose(up[:, 2], [40.0, -16.0])

    def test_rescale_homography_consistent(self):
        h = np.array([[1.05, 0.02, 12.0], [0.01, 0.98, -4.0], [1e-4, 0, 1.0]], np.float32)
        up = np.asarray(rescale_transform(jnp.asarray(h), 0.25))
        # point p maps at small scale; 4p must map to 4*q at full scale
        p = np.array([10.0, 20.0, 1.0])
        q = h @ p
        q = q / q[2]
        pq = up @ (p * np.array([4, 4, 1.0]))
        pq = pq / pq[2]
        np.testing.assert_allclose(pq[:2], q[:2] * 4, rtol=1e-4)

    def test_affine_to_homography(self):
        mat = jnp.asarray(np.array([[1.0, 0, 3], [0, 1, 4]], np.float32))
        h = np.asarray(affine_to_homography(mat))
        assert h.shape == (3, 3)
        np.testing.assert_allclose(h[2], [0, 0, 1])
