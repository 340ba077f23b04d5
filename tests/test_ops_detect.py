"""NMS + keypoint extraction + descriptor sampling tests."""
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops import (
    detect_keypoints,
    refine_keypoints_subpixel,
    sample_descriptors,
    simple_nms,
    soft_argmax_2d,
)


class TestSimpleNMS:
    def test_no_two_survivors_within_radius(self):
        rng = np.random.default_rng(0)
        scores = jnp.asarray(rng.uniform(0, 1, (1, 64, 64)).astype(np.float32))
        out = np.asarray(simple_nms(scores, radius=4))[0]
        ys, xs = np.nonzero(out)
        pts = np.stack([ys, xs], -1)
        if len(pts) > 1:
            d = np.abs(pts[:, None] - pts[None]).max(-1)
            np.fill_diagonal(d, 99)
            assert d.min() > 4

    def test_isolated_peaks_survive(self):
        s = jnp.zeros((1, 32, 32)).at[0, 5, 5].set(0.9).at[0, 20, 25].set(0.8)
        out = np.asarray(simple_nms(s, radius=4))[0]
        assert out[5, 5] == np.float32(0.9) and out[20, 25] == np.float32(0.8)
        assert (out > 0).sum() == 2

    def test_weaker_neighbor_suppressed(self):
        s = jnp.zeros((1, 32, 32)).at[0, 10, 10].set(0.9).at[0, 10, 12].set(0.5)
        out = np.asarray(simple_nms(s, radius=4))[0]
        assert out[10, 10] > 0 and out[10, 12] == 0

    def test_matches_reference_algorithm_on_torch(self):
        """Oracle: the maxpool-NMS algorithm run with torch.nn.functional,
        checking our XLA reduce_window port bit-for-bit."""
        import torch
        import torch.nn.functional as F

        def torch_simple_nms(scores, radius):
            def mp(x):
                return F.max_pool2d(x, radius * 2 + 1, stride=1, padding=radius)

            zeros = torch.zeros_like(scores)
            max_mask = scores == mp(scores)
            for _ in range(2):
                supp_mask = mp(max_mask.float()) > 0
                supp_scores = torch.where(supp_mask, zeros, scores)
                new_max_mask = supp_scores == mp(supp_scores)
                max_mask = max_mask | (new_max_mask & (~supp_mask))
            return torch.where(max_mask, scores, zeros)

        rng = np.random.default_rng(1)
        arr = rng.uniform(0, 1, (2, 48, 40)).astype(np.float32)
        ours = np.asarray(simple_nms(jnp.asarray(arr), radius=4))
        ref = torch_simple_nms(torch.from_numpy(arr)[:, None], 4)[:, 0].numpy()
        np.testing.assert_array_equal(ours, ref)


class TestDetectKeypoints:
    def test_finds_planted_peaks(self):
        s = (
            jnp.zeros((1, 64, 64))
            .at[1 * 0 + 0, 10, 20].set(0.9)
            .at[0, 40, 50].set(0.7)
            .at[0, 30, 8].set(0.5)
        )
        kp = detect_keypoints(s, max_keypoints=8, threshold=0.1)
        assert int(kp.num_valid()[0]) == 3
        got = {tuple(map(int, p)) for p, m in zip(np.asarray(kp.xy[0]), np.asarray(kp.mask[0])) if m}
        assert got == {(20, 10), (50, 40), (8, 30)}
        # sorted by score
        assert float(kp.score[0, 0]) >= float(kp.score[0, 1])

    def test_border_removed(self):
        s = jnp.zeros((1, 32, 32)).at[0, 2, 2].set(0.9).at[0, 16, 16].set(0.5)
        kp = detect_keypoints(s, max_keypoints=4, threshold=0.1, border=4)
        assert int(kp.num_valid()[0]) == 1
        assert tuple(np.asarray(kp.xy[0, 0]).astype(int)) == (16, 16)

    def test_k_exceeds_tile_count(self):
        """Small image with max_keypoints larger than the 4x4-tile count
        (the HA-export regime: top_k=1200 on small frames) must fall back
        to the flat top-k, and larger than H*W must pad masked slots."""
        s = jnp.zeros((1, 64, 64)).at[0, 10, 20].set(0.9).at[0, 40, 50].set(0.7)
        for k in (1200, 8192):  # 256 tiles, 4096 pixels
            kp = detect_keypoints(s, max_keypoints=k, threshold=0.1, nms_radius=4)
            assert kp.xy.shape == (1, k, 2)
            assert int(kp.num_valid()[0]) == 2
            got = {tuple(map(int, p))
                   for p, m in zip(np.asarray(kp.xy[0]), np.asarray(kp.mask[0])) if m}
            assert got == {(20, 10), (50, 40)}

    def test_capacity_masking(self):
        rng = np.random.default_rng(2)
        s = jnp.asarray(rng.uniform(0.5, 1.0, (1, 64, 64)).astype(np.float32))
        kp = detect_keypoints(s, max_keypoints=16, threshold=0.0, nms_radius=2)
        assert kp.xy.shape == (1, 16, 2)
        assert bool(kp.mask.all())


class TestSampleDescriptors:
    def test_matches_torch_grid_sample(self):
        """Oracle: the reference's normalisation + F.grid_sample
        (superpoint_test.py:40-52) rebuilt with torch CPU."""
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(3)
        hc, wc, d, s = 6, 8, 16, 8
        desc = rng.normal(size=(1, hc, wc, d)).astype(np.float32)
        kpts = rng.uniform(4, 44, (1, 20, 2)).astype(np.float32)

        ours = np.asarray(sample_descriptors(jnp.asarray(kpts), jnp.asarray(desc), s))

        td = torch.from_numpy(desc).permute(0, 3, 1, 2)  # (1, D, Hc, Wc)
        tk = torch.from_numpy(kpts.copy())
        tk = tk - s / 2 + 0.5
        tk = tk / torch.tensor([wc * s - s / 2 - 0.5, hc * s - s / 2 - 0.5])
        tk = tk * 2 - 1
        ref = F.grid_sample(
            td, tk.view(1, 1, -1, 2), mode="bilinear", align_corners=True
        )
        ref = F.normalize(ref.reshape(1, d, -1), p=2, dim=1)
        ref = ref.permute(0, 2, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_unit_norm(self):
        rng = np.random.default_rng(4)
        desc = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
        kpts = jnp.asarray(rng.uniform(0, 31, (2, 5, 2)).astype(np.float32))
        out = sample_descriptors(kpts, desc, 8)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5
        )


class TestSoftArgmax:
    def test_peak_location(self):
        p = jnp.zeros((1, 1, 5, 5)).at[0, 0, 1, 3].set(20.0)
        out = np.asarray(soft_argmax_2d(p))[0, 0]
        np.testing.assert_allclose(out, [3.0, 1.0], atol=1e-3)

    def test_subpixel_refinement_recovers_offset(self):
        # gaussian blob centred at (x=16.4, y=12.7)
        ys, xs = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        heat = np.exp(-((xs - 16.4) ** 2 + (ys - 12.7) ** 2) / 2.0).astype(np.float32)
        xy = jnp.array([[[16.0, 13.0]]])
        refined = np.asarray(
            refine_keypoints_subpixel(jnp.asarray(heat)[None], xy, patch_size=5)
        )[0, 0]
        # 5x5 window truncation biases the estimate slightly toward centre
        np.testing.assert_allclose(refined, [16.4, 12.7], atol=0.2)


class TestTiledTopK:
    def test_matches_full_sort_after_nms(self):
        """Tiled two-stage top-k equals the flat full-heatmap sort on
        NMS'd scores (radius 4 → ≤1 survivor per 4x4 tile)."""
        from image_matching_tpu.ops.detect import _tiled_topk
        from image_matching_tpu.ops.nms import simple_nms

        rng = np.random.default_rng(11)
        for h, w in ((60, 80), (64, 96), (47, 53)):
            heat = jnp.asarray(rng.uniform(size=(2, h, w)).astype(np.float32))
            scores = simple_nms(heat, 4, 2)
            k = 64
            flat_scores, flat_idx = jax.lax.top_k(scores.reshape(2, -1), k)
            got_scores, yy, xx = _tiled_topk(scores, k, tile=4)
            np.testing.assert_allclose(
                np.asarray(got_scores), np.asarray(flat_scores), atol=0
            )
            got_idx = np.asarray(yy) * w + np.asarray(xx)
            # positive-score entries must point at identical pixels
            pos = np.asarray(flat_scores) > 0
            np.testing.assert_array_equal(
                got_idx[pos], np.asarray(flat_idx)[pos]
            )
