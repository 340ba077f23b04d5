"""s2d-resident conv == direct conv, exactly (f32)."""
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.s2d_conv import (
    conv3x3_s2d,
    depth_to_space,
    maxpool2x2_s2d,
    space_to_depth,
)


def _direct_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
    )


def test_conv3x3_s2d_matches_direct():
    rng = np.random.default_rng(1)
    for ci, co, h, w_ in [(1, 8, 16, 20), (8, 16, 12, 12), (5, 7, 10, 14)]:
        x = jnp.asarray(rng.normal(size=(2, h, w_, ci)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32))
        ref = _direct_conv(x, w)
        got = depth_to_space(conv3x3_s2d(space_to_depth(x), w))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_maxpool_s2d_matches_direct():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 20, 6)).astype(np.float32))
    ref = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    got = maxpool2x2_s2d(space_to_depth(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_chained_conv_pool_stays_exact():
    """Two conv+pool levels entirely in s2d space."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 4)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32))

    ref = _direct_conv(x, w1)
    ref = jax.lax.reduce_window(
        ref, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    ref = _direct_conv(ref, w2)

    y = conv3x3_s2d(space_to_depth(x), w1)
    y = maxpool2x2_s2d(y)          # (B, 16, 16, 8) full-res-16 map
    y = conv3x3_s2d(space_to_depth(y), w2)
    got = depth_to_space(y)
    # two chained convs accumulate in different orders; noise is ~5e-5
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-3
    )


class TestS2DModels:
    """s2d=True models are parameter- and output-compatible with plain."""

    def _check(self, cls, layout="2x2", **kw):
        import jax
        from flax.core import unfreeze

        rng = np.random.default_rng(5)
        img = jnp.asarray(rng.uniform(size=(2, 64, 80, 1)).astype(np.float32))
        plain = cls(descriptor_dim=64, s2d=False, **kw)
        fast = cls(descriptor_dim=64, s2d=True, s2d_layout=layout, **kw)
        v_plain = plain.init(jax.random.PRNGKey(0), img)
        v_fast = fast.init(jax.random.PRNGKey(0), img)
        # identical param trees (paths AND values — same init rng paths)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            ),
            unfreeze(v_plain), unfreeze(v_fast),
        )
        out_p = plain.apply(v_plain, img)
        out_f = fast.apply(v_plain, img)  # cross-apply: plain params, s2d path
        np.testing.assert_allclose(
            np.asarray(out_f["semi"]), np.asarray(out_p["semi"]),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out_f["desc_map"]), np.asarray(out_p["desc_map"]),
            rtol=1e-4, atol=1e-4,
        )

    def test_vgg_s2d_parity(self):
        from image_matching_tpu.models.superpoint import SuperPointVGG

        self._check(SuperPointVGG)

    def test_bn_s2d_parity(self):
        from image_matching_tpu.models.superpoint import SuperPointBN

        self._check(SuperPointBN)

    def test_vgg_s2dh_parity(self):
        from image_matching_tpu.models.superpoint import SuperPointVGG

        self._check(SuperPointVGG, layout="h")

    def test_bn_s2dh_parity(self):
        from image_matching_tpu.models.superpoint import SuperPointBN

        self._check(SuperPointBN, layout="h")

    def test_bn_s2d_train_stats_match(self):
        import jax
        from image_matching_tpu.models.superpoint import SuperPointBN

        rng = np.random.default_rng(6)
        img = jnp.asarray(rng.uniform(size=(2, 32, 32, 1)).astype(np.float32))
        plain = SuperPointBN(descriptor_dim=32, s2d=False)
        fast = SuperPointBN(descriptor_dim=32, s2d=True)
        v = plain.init(jax.random.PRNGKey(1), img)
        _, m_plain = plain.apply(v, img, train=True, mutable=["batch_stats"])
        _, m_fast = fast.apply(v, img, train=True, mutable=["batch_stats"])
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            dict(m_plain), dict(m_fast),
        )


class TestS2DFusedVariants:
    def _rand(self, *shape):
        rng = np.random.default_rng(11)
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def test_entry_conv_equals_s2d_of_conv(self):
        from image_matching_tpu.ops.s2d_conv import conv3x3_s2d_entry

        x = self._rand(2, 16, 24, 5)
        w = self._rand(3, 3, 5, 6)
        ref = space_to_depth(_direct_conv(x, w))
        got = conv3x3_s2d_entry(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_raw_conv_realigned_equals_s2d_of_conv(self):
        from image_matching_tpu.ops.s2d_conv import conv3x3_s2d_raw, realign

        x = self._rand(2, 12, 16, 4)
        w = self._rand(3, 3, 4, 8)
        ref = space_to_depth(_direct_conv(x, w))
        got = realign(conv3x3_s2d_raw(space_to_depth(x), w))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_pool_from_raw_equals_pool_of_conv(self):
        from image_matching_tpu.ops.s2d_conv import (
            conv3x3_s2d_raw,
            maxpool2x2_s2d_from_raw,
        )

        x = self._rand(2, 12, 16, 4)
        w = self._rand(3, 3, 4, 8)
        ref = jax.lax.reduce_window(
            _direct_conv(x, w), -jnp.inf, jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
        )
        got = maxpool2x2_s2d_from_raw(conv3x3_s2d_raw(space_to_depth(x), w))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_full_fused_level_chain(self):
        """entry conv → raw conv → fused pool == plain conv/conv/pool."""
        from image_matching_tpu.ops.s2d_conv import (
            conv3x3_s2d_entry,
            conv3x3_s2d_raw,
            maxpool2x2_s2d_from_raw,
        )

        x = self._rand(2, 16, 24, 3)
        w1 = self._rand(3, 3, 3, 8)
        w2 = self._rand(3, 3, 8, 8)
        ref = _direct_conv(x, w1)
        ref = _direct_conv(ref, w2)
        ref = jax.lax.reduce_window(
            ref, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        a = conv3x3_s2d_entry(x, w1)
        u = conv3x3_s2d_raw(a, w2)
        got = maxpool2x2_s2d_from_raw(u)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_mm1x1_parity_invariance(self):
        from image_matching_tpu.ops.s2d_conv import mm1x1_s2d, realign

        u = self._rand(2, 7, 9, 16)  # a fake U tensor (4 groups of 4)
        w = self._rand(4, 5)
        # applying 1x1 then realigning == realigning then applying 1x1
        a = realign(mm1x1_s2d(u, w))
        b = mm1x1_s2d(realign(u), w)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestS2DHVariants:
    """H-only (2, 1) space-to-depth pipeline (ops/s2d_conv.py v3):
    25% fewer machine MACs than the (2, 2) form (kernel 3/4 dense along
    rows, fully dense along columns) at the same exact output."""

    def _rand(self, *shape):
        return jnp.asarray(
            np.random.default_rng(hash(shape) % 2**31).normal(size=shape),
            jnp.float32,
        )

    def test_roundtrip(self):
        from image_matching_tpu.ops.s2d_conv import (
            depth_to_space_h,
            space_to_depth_h,
        )

        x = self._rand(2, 8, 6, 5)
        np.testing.assert_array_equal(
            np.asarray(depth_to_space_h(space_to_depth_h(x))), np.asarray(x)
        )

    def test_raw_conv_realign_matches_direct(self):
        from image_matching_tpu.ops.s2d_conv import (
            conv3x3_s2dh_raw,
            depth_to_space_h,
            realign_h,
            space_to_depth_h,
        )

        x = self._rand(2, 16, 24, 5)
        w = self._rand(3, 3, 5, 7)
        got = depth_to_space_h(realign_h(conv3x3_s2dh_raw(space_to_depth_h(x), w)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_direct_conv(x, w)), atol=1e-5
        )

    def test_entry_conv_matches_conv_then_s2dh(self):
        from image_matching_tpu.ops.s2d_conv import (
            conv3x3_s2dh_entry,
            space_to_depth_h,
        )

        x = self._rand(2, 16, 24, 3)
        w = self._rand(3, 3, 3, 8)
        got = conv3x3_s2dh_entry(x, w)
        ref = space_to_depth_h(_direct_conv(x, w))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_fused_pool_matches_direct(self):
        from image_matching_tpu.ops.s2d_conv import (
            conv3x3_s2dh_raw,
            maxpool2x2_s2dh_from_raw,
            space_to_depth_h,
        )

        x = self._rand(2, 16, 24, 4)
        w = self._rand(3, 3, 4, 8)
        ref = jax.lax.reduce_window(
            _direct_conv(x, w), -jnp.inf, jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
        )
        got = maxpool2x2_s2dh_from_raw(conv3x3_s2dh_raw(space_to_depth_h(x), w))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_full_level_chain(self):
        """entry_h → raw_h → fused pool == plain conv/conv/pool."""
        from image_matching_tpu.ops.s2d_conv import (
            conv3x3_s2dh_entry,
            conv3x3_s2dh_raw,
            maxpool2x2_s2dh_from_raw,
        )

        x = self._rand(2, 16, 24, 3)
        w1 = self._rand(3, 3, 3, 8)
        w2 = self._rand(3, 3, 8, 8)
        ref = _direct_conv(_direct_conv(x, w1), w2)
        ref = jax.lax.reduce_window(
            ref, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        got = maxpool2x2_s2dh_from_raw(
            conv3x3_s2dh_raw(conv3x3_s2dh_entry(x, w1), w2)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_mm1x1_parity_invariance(self):
        from image_matching_tpu.ops.s2d_conv import mm1x1_s2dh, realign_h

        u = self._rand(2, 7, 9, 8)  # fake Uh (2 groups of 4)
        w = self._rand(4, 5)
        a = realign_h(mm1x1_s2dh(u, w))
        b = mm1x1_s2dh(realign_h(u), w)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
