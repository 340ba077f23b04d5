"""Label ops: space/depth shuffles, dustbin labels, splatting, HA aggregation."""
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.geometry import (
    combine_heatmaps,
    depth_to_space,
    flatten_detection,
    invert_homography,
    labels_2d_to_3d,
    scatter_points,
    space_to_depth,
    splat_points_bilinear,
    warp_image,
)
from image_matching_tpu.geometry.homography import sample_homography_batch


class TestSpaceDepth:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 16, 24, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(depth_to_space(space_to_depth(x, 8), 8)), np.asarray(x)
        )

    def test_cell_layout(self):
        # a single hot pixel at (y=3, x=10) lands in cell (0, 1), channel 3*8+2
        x = jnp.zeros((1, 8, 16, 1)).at[0, 3, 10, 0].set(1.0)
        c = space_to_depth(x, 8)
        assert c.shape == (1, 1, 2, 64)
        assert float(c[0, 0, 1, 3 * 8 + 2]) == 1.0
        assert float(jnp.sum(c)) == 1.0


class TestLabels2Dto3D:
    def test_empty_cell_is_dustbin(self):
        labels = jnp.zeros((1, 16, 16, 1))
        out = labels_2d_to_3d(labels)
        assert out.shape == (1, 2, 2, 65)
        np.testing.assert_allclose(np.asarray(out[..., -1]), 1.0)
        np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0)

    def test_occupied_cell_distribution(self):
        labels = jnp.zeros((1, 8, 8, 1)).at[0, 2, 5, 0].set(1.0).at[0, 4, 1, 0].set(1.0)
        out = labels_2d_to_3d(labels)
        assert out.shape == (1, 1, 1, 65)
        assert float(out[0, 0, 0, -1]) == 0.0  # no dustbin mass
        np.testing.assert_allclose(float(out.sum()), 1.0, rtol=1e-6)
        # two keypoints -> each gets 1/2
        np.testing.assert_allclose(float(out[0, 0, 0, 2 * 8 + 5]), 0.5, rtol=1e-6)

    def test_flatten_detection_inverts_argmax(self):
        # strong logit at channel c -> heat peak at the matching pixel
        semi = jnp.zeros((1, 2, 3, 65)).at[0, 1, 2, 11].set(10.0)
        heat = flatten_detection(semi)
        assert heat.shape == (1, 16, 24, 1)
        y, x = divmod(11, 8)
        assert float(heat[0, 1 * 8 + y, 2 * 8 + x, 0]) > 0.9


class TestSplat:
    def test_scatter_integer_points(self):
        xy = jnp.array([[3.0, 2.0], [7.0, 7.0], [100.0, 100.0]])
        mask = jnp.array([True, True, True])
        m = scatter_points(xy, mask, 8, 8)
        assert float(m[2, 3]) == 1.0 and float(m[7, 7]) == 1.0
        assert float(m.sum()) == 2.0  # out-of-bounds dropped

    def test_scatter_respects_mask(self):
        xy = jnp.array([[1.0, 1.0], [2.0, 2.0]])
        m = scatter_points(xy, jnp.array([True, False]), 4, 4)
        assert float(m.sum()) == 1.0

    def test_bilinear_weights(self):
        xy = jnp.array([[1.5, 2.0]])
        m = splat_points_bilinear(xy, jnp.array([True]), 8, 8)
        np.testing.assert_allclose(float(m[2, 1]), 0.5, rtol=1e-6)
        np.testing.assert_allclose(float(m[2, 2]), 0.5, rtol=1e-6)
        np.testing.assert_allclose(float(m.sum()), 1.0, rtol=1e-6)


class TestCombineHeatmaps:
    def test_identity_homographies_average(self):
        rng = np.random.default_rng(1)
        heat = jnp.asarray(rng.uniform(0, 1, (5, 16, 16, 1)).astype(np.float32))
        hs = jnp.broadcast_to(jnp.eye(3), (5, 3, 3))
        masks = jnp.ones((5, 16, 16, 1))
        out = combine_heatmaps(heat, hs, masks)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(heat.mean(0)), atol=1e-5
        )

    def test_warp_roundtrip_recovers_peak(self):
        """End-to-end HA consistency: warp image to N views, warp heatmaps
        back, the aggregate peak must sit at the original location."""
        base = jnp.zeros((32, 32, 1)).at[16, 16, 0].set(1.0)
        # blur the peak a bit so bilinear resampling keeps mass
        k = jnp.ones((1, 1, 3, 3)) / 9.0
        base = jax.lax.conv_general_dilated(
            base[None].transpose(0, 3, 1, 2), k, (1, 1), "SAME"
        ).transpose(0, 2, 3, 1)[0]

        hs = sample_homography_batch(jax.random.PRNGKey(0), 6, 32, 32)
        h_invs = invert_homography(hs)
        views = warp_image(jnp.broadcast_to(base, (6, 32, 32, 1)), h_invs)
        masks = jnp.ones((6, 32, 32, 1))
        agg = combine_heatmaps(views, hs, masks)
        peak = jnp.unravel_index(jnp.argmax(agg[..., 0]), (32, 32))
        assert abs(int(peak[0]) - 16) <= 1 and abs(int(peak[1]) - 16) <= 1
