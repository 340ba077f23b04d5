"""Model tests: SuperPoint variants, SuperGlue invariances, Matching e2e."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_matching_tpu.models import (
    Matching,
    MatchingConfig,
    SuperGlue,
    SuperPointBN,
    SuperPointVGG,
)
from image_matching_tpu.models.superpoint import superpoint_postprocess
from image_matching_tpu.structs import Keypoints


def make_kpts(rng, n, k, d, n_valid=None):
    n_valid = n_valid if n_valid is not None else k
    xy = rng.uniform(8, 56, (n, k, 2)).astype(np.float32)
    score = rng.uniform(0.1, 1.0, (n, k)).astype(np.float32)
    desc = rng.normal(size=(n, k, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    mask = np.zeros((n, k), bool)
    mask[:, :n_valid] = True
    return Keypoints(
        xy=jnp.asarray(xy),
        score=jnp.asarray(score * mask),
        mask=jnp.asarray(mask),
        desc=jnp.asarray(desc * mask[..., None]),
    )


class TestSuperPoint:
    @pytest.mark.parametrize("cls", [SuperPointBN, SuperPointVGG])
    def test_output_shapes(self, cls):
        model = cls(descriptor_dim=128)
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (2, 64, 80, 1)).astype(np.float32)
        )
        variables = model.init(jax.random.PRNGKey(0), img)
        out = model.apply(variables, img)
        assert out["semi"].shape == (2, 8, 10, 65)
        assert out["desc_map"].shape == (2, 8, 10, 128)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["desc_map"]), axis=-1), 1.0, rtol=1e-4
        )

    def test_bn_train_mode_updates_stats(self):
        model = SuperPointBN(descriptor_dim=64)
        img = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
        )
        variables = model.init(jax.random.PRNGKey(0), img)
        out, mutated = model.apply(
            variables, img, train=True, mutable=["batch_stats"]
        )
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )

    def test_postprocess_produces_masked_keypoints(self):
        model = SuperPointBN(descriptor_dim=64)
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img)
        out = model.apply(variables, img)
        kp = superpoint_postprocess(out, max_keypoints=64, threshold=0.0)
        assert kp.xy.shape == (1, 64, 2)
        assert kp.desc.shape == (1, 64, 64)
        valid_desc = np.asarray(kp.desc[0])[np.asarray(kp.mask[0])]
        if len(valid_desc):
            np.testing.assert_allclose(
                np.linalg.norm(valid_desc, axis=-1), 1.0, rtol=1e-4
            )

    def test_bf16_heatmap_matches_f32_keypoints(self):
        """The default bf16 heatmap path (perf: halved pixel-shuffle/NMS
        traffic) must select the same keypoints as an explicit f32
        heatmap away from exact score ties."""
        from image_matching_tpu.geometry.labels import flatten_detection

        model = SuperPointBN(descriptor_dim=64)
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img)
        out = model.apply(variables, img)
        kp_bf16 = superpoint_postprocess(out, max_keypoints=32, threshold=0.001)
        heat32 = flatten_detection(out["semi"], 8, dtype=jnp.float32)
        kp_f32 = superpoint_postprocess(
            out, max_keypoints=32, threshold=0.001, heatmap=heat32
        )
        for b in range(2):
            got = {tuple(map(int, p)) for p, m in
                   zip(np.asarray(kp_bf16.xy[b]), np.asarray(kp_bf16.mask[b])) if m}
            want = {tuple(map(int, p)) for p, m in
                    zip(np.asarray(kp_f32.xy[b]), np.asarray(kp_f32.mask[b])) if m}
            # bf16 rounding may swap marginal entries at the capacity
            # boundary; demand near-total agreement, not bit equality
            inter = len(got & want)
            assert inter >= 0.9 * max(len(got), len(want), 1)


class TestSuperGlue:
    def _model_and_vars(self, d=64, k=16, layers=4, iters=20):
        model = SuperGlue(
            descriptor_dim=d,
            keypoint_encoder=(32, d),
            gnn_layers=layers,
            sinkhorn_iterations=iters,
            match_threshold=0.2,
        )
        rng = np.random.default_rng(0)
        kp = make_kpts(rng, 1, k, d)
        variables = model.init(
            jax.random.PRNGKey(0), kp, kp, (64, 64), (64, 64)
        )
        return model, variables

    def test_forward_shapes(self):
        model, variables = self._model_and_vars(d=64, k=16)
        rng = np.random.default_rng(1)
        kp0 = make_kpts(rng, 2, 16, 64)
        kp1 = make_kpts(rng, 2, 16, 64)
        out = model.apply(variables, kp0, kp1, (64, 64), (64, 64))
        assert out["matches0"].shape == (2, 16)
        assert out["log_coupling"].shape == (2, 17, 17)
        assert np.isfinite(np.asarray(out["log_coupling"])).all()

    def test_identical_sets_match_identity(self):
        """A pair where set1 == set0 exactly must match i->i: the score
        matrix is symmetric with dominant diagonal after OT."""
        model, variables = self._model_and_vars(d=64, k=12, layers=2, iters=50)
        rng = np.random.default_rng(2)
        kp = make_kpts(rng, 1, 12, 64)
        out = model.apply(variables, kp, kp, (64, 64), (64, 64))
        m0 = np.asarray(out["matches0"][0])
        matched = m0 >= 0
        # with an untrained net some pairs fall below threshold; those that
        # do match must match the identity
        assert (m0[matched] == np.arange(12)[matched]).all()

    def test_bf16_logits_agrees_with_f32(self):
        """logits_dtype="bfloat16" (the inference default's HBM-traffic
        option) adds no params and must agree with the f32-logits path
        on confident matches: same identity matching on a duplicated
        set, near-total matches0 agreement, small score deltas."""
        model, variables = self._model_and_vars(d=64, k=12, layers=2, iters=50)
        model_bf = SuperGlue(
            descriptor_dim=64,
            keypoint_encoder=(32, 64),
            gnn_layers=2,
            sinkhorn_iterations=50,
            match_threshold=0.2,
            logits_dtype="bfloat16",
        )
        rng = np.random.default_rng(2)
        kp = make_kpts(rng, 1, 12, 64)
        out = model.apply(variables, kp, kp, (64, 64), (64, 64))
        out_bf = model_bf.apply(variables, kp, kp, (64, 64), (64, 64))
        m0, m0_bf = np.asarray(out["matches0"][0]), np.asarray(out_bf["matches0"][0])
        matched = m0_bf >= 0
        assert (m0_bf[matched] == np.arange(12)[matched]).all()
        assert (m0 == m0_bf).mean() >= 0.9
        ds = np.abs(
            np.asarray(out["matching_scores0"], np.float32)
            - np.asarray(out_bf["matching_scores0"], np.float32)
        ).max()
        assert ds < 0.15, f"score drift {ds}"

    def test_padding_invariance(self):
        """Extra masked-out slots must not change valid matches (eval mode)."""
        model, variables = self._model_and_vars(d=32, k=24)
        rng = np.random.default_rng(3)
        kp0_small = make_kpts(rng, 1, 24, 32, n_valid=10)
        kp1_small = make_kpts(rng, 1, 24, 32, n_valid=14)
        out = model.apply(variables, kp0_small, kp1_small, (64, 64), (64, 64))

        # same valid content, garbage in padding slots
        def poison(kp):
            pad = ~np.asarray(kp.mask)
            xy = np.asarray(kp.xy).copy()
            desc = np.asarray(kp.desc).copy()
            xy[pad] = 999.0
            desc[pad] = 5.0
            return kp.replace(xy=jnp.asarray(xy), desc=jnp.asarray(desc))

        out2 = model.apply(variables, poison(kp0_small), poison(kp1_small), (64, 64), (64, 64))
        np.testing.assert_array_equal(
            np.asarray(out["matches0"][0, :10]), np.asarray(out2["matches0"][0, :10])
        )
        np.testing.assert_allclose(
            np.asarray(out["matching_scores0"][0, :10]),
            np.asarray(out2["matching_scores0"][0, :10]),
            rtol=1e-4, atol=1e-5,
        )

    def test_invalid_slots_never_match(self):
        model, variables = self._model_and_vars(d=32, k=16)
        rng = np.random.default_rng(4)
        kp0 = make_kpts(rng, 1, 16, 32, n_valid=8)
        kp1 = make_kpts(rng, 1, 16, 32, n_valid=16)
        out = model.apply(variables, kp0, kp1, (64, 64), (64, 64))
        assert (np.asarray(out["matches0"][0, 8:]) == -1).all()


class TestMatching:
    def test_end_to_end_pair(self):
        cfg = MatchingConfig(
            backbone="bn",
            descriptor_dim=64,
            max_keypoints=32,
            keypoint_threshold=0.0,
            keypoint_encoder=(32, 64),
            gnn_layers=2,
            sinkhorn_iterations=10,
            compute_dtype="float32",
        )
        model = Matching(cfg)
        rng = np.random.default_rng(5)
        img0 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img0, img1)
        out = jax.jit(lambda v, a, b: model.apply(v, a, b))(variables, img0, img1)
        assert out["matches0"].shape == (1, 32)
        assert out["keypoints0"].xy.shape == (1, 32, 2)
        assert np.isfinite(np.asarray(out["log_coupling"])).all()

    def test_fused_detect_matches_separate(self):
        """The 2B-batched detect fast path must agree with detecting each
        image separately (per-sample conv/BN numerics are batch-size
        independent)."""
        cfg = MatchingConfig(
            backbone="bn",
            descriptor_dim=64,
            max_keypoints=16,
            keypoint_threshold=0.0,
            keypoint_encoder=(32, 64),
            gnn_layers=2,
            sinkhorn_iterations=10,
            compute_dtype="float32",
        )
        model = Matching(cfg)
        rng = np.random.default_rng(7)
        img0 = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img0, img1)

        kp0 = model.apply(variables, img0, method=Matching.detect)
        kp1 = model.apply(variables, img1, method=Matching.detect)
        fused = model.apply(variables, img0, img1)
        sep = model.apply(variables, img0, img1, kpts0=kp0, kpts1=kp1)
        np.testing.assert_allclose(
            np.asarray(fused["keypoints0"].xy), np.asarray(kp0.xy), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(fused["keypoints1"].xy), np.asarray(kp1.xy), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(fused["matching_scores0"]),
            np.asarray(sep["matching_scores0"]),
            atol=1e-4,
        )


class TestSubpixelPostprocess:
    def test_refines_toward_true_peak(self):
        """A peak whose mass leans off the integer maximum must move
        toward the lean under subpixel=True (reference model_wrap
        soft_argmax_points semantics)."""
        from image_matching_tpu.models.superpoint import superpoint_postprocess

        h = w = 32
        heat = np.zeros((1, h, w), np.float32)
        # an asymmetric blob around (y=16, x=20), leaning +x
        heat[0, 16, 20] = 1.0
        heat[0, 16, 21] = 0.6
        heat[0, 16, 19] = 0.2
        heat[0, 15, 20] = 0.3
        heat[0, 17, 20] = 0.3
        hm = jnp.asarray(heat)
        out = {"semi": None, "desc_map": jnp.ones((1, 4, 4, 8))}
        kp_int = superpoint_postprocess(
            out, max_keypoints=4, threshold=0.1, heatmap=hm, border=2
        )
        kp_sub = superpoint_postprocess(
            out, max_keypoints=4, threshold=0.1, heatmap=hm, border=2,
            subpixel=True,
        )
        assert tuple(np.asarray(kp_int.xy[0, 0]).astype(int)) == (20, 16)
        x_sub, y_sub = np.asarray(kp_sub.xy[0, 0])
        assert 20.0 < x_sub < 21.0  # leaned toward the +x mass
        assert abs(y_sub - 16.0) < 0.2
        # masked slots untouched
        assert kp_sub.xy.shape == (1, 4, 2)


class TestStackedSidesGNN:
    def test_stacked_equals_two_call(self):
        """The 2B-stacked GNN layout must be per-sample identical to the
        two-call path (same params; eval mode)."""
        from image_matching_tpu.models.superglue import AttentionalGNN

        d, k, b = 64, 32, 2
        rng = np.random.default_rng(0)
        names = tuple("self" if i % 2 == 0 else "cross" for i in range(4))
        two = AttentionalGNN(d, names, stack_sides=False)
        stk = AttentionalGNN(d, names, stack_sides=True)
        desc0 = jnp.asarray(rng.normal(size=(b, k, d)).astype(np.float32))
        desc1 = jnp.asarray(rng.normal(size=(b, k, d)).astype(np.float32))
        mask0 = jnp.asarray(rng.uniform(size=(b, k)) < 0.8)
        mask1 = jnp.asarray(rng.uniform(size=(b, k)) < 0.8)
        variables = two.init(jax.random.PRNGKey(1), desc0, desc1, mask0, mask1)
        a0, a1 = two.apply(variables, desc0, desc1, mask0, mask1)
        s0, s1 = stk.apply(variables, desc0, desc1, mask0, mask1)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(a0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(a1), atol=1e-5)
