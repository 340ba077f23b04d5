"""Pallas fused realign+maxpool vs the XLA formulation (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.pallas.realign import (
    maxpool_realign,
    maxpool_realign_pallas,
)
from image_matching_tpu.ops.s2d_conv import (
    conv3x3_s2d_raw,
    maxpool2x2_s2d_from_raw,
    space_to_depth,
)


def _rand_u(b, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(size=(b, h + 1, w + 1, 4 * c)).astype(np.float32)
    )


def test_kernel_matches_xla_formulation():
    u = _rand_u(2, 16, 24, 8)
    ref = maxpool2x2_s2d_from_raw(u)
    got = maxpool_realign_pallas(u, block_rows=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_kernel_on_real_conv_output():
    """Through an actual s2d conv: equals plain conv + maxpool."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    u = conv3x3_s2d_raw(space_to_depth(x), w)
    direct = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    ref = jax.lax.reduce_window(
        direct, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    got = maxpool_realign_pallas(u, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_wrapper_block_size_fallbacks():
    # H=30 → block_rows=2 path; H=7 → XLA fallback
    u30 = _rand_u(1, 30, 40, 4, seed=2)
    np.testing.assert_array_equal(
        np.asarray(maxpool_realign(u30, interpret=True)),
        np.asarray(maxpool2x2_s2d_from_raw(u30)),
    )
    u7 = _rand_u(1, 7, 9, 4, seed=3)
    np.testing.assert_array_equal(
        np.asarray(maxpool_realign(u7, interpret=True)),
        np.asarray(maxpool2x2_s2d_from_raw(u7)),
    )


def test_custom_vjp_matches_xla_grad():
    """maxpool_realign's backward (recompute through the XLA slice
    formulation) equals the XLA formulation's own VJP."""
    from image_matching_tpu.ops.pallas.realign import _maxpool_realign_bwd

    u = _rand_u(1, 16, 24, 4, seed=5)
    g = jnp.asarray(
        np.random.default_rng(6).normal(size=(1, 16, 24, 4)).astype(np.float32)
    )
    ref_out, ref_vjp = jax.vjp(maxpool2x2_s2d_from_raw, u)
    (got,) = _maxpool_realign_bwd(None, u, g)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref_vjp(g)[0]))


def test_padded_width_out_w():
    """extra_cols-padded U + explicit out_w equals the unpadded result —
    the hardware path's shape contract (DMA needs stored width % 8 == 0,
    conv3x3_s2d_raw(extra_cols) provides it)."""
    u = _rand_u(1, 16, 24, 8, seed=9)  # stored width 25
    pad = (-(24 + 1)) % 8  # -> 32 stored cols
    up = jnp.pad(u, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=-7.0)
    ref = maxpool2x2_s2d_from_raw(u)
    got = maxpool_realign_pallas(up, out_w=24, block_rows=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # the XLA formulation honors out_w on padded U too
    np.testing.assert_array_equal(
        np.asarray(maxpool2x2_s2d_from_raw(up, out_w=24)), np.asarray(ref)
    )


def test_conv_extra_cols_prefix_equal():
    """conv3x3_s2d_raw(extra_cols) == the plain raw conv on the true cols."""
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(1, 12, 20, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    plain = conv3x3_s2d_raw(x, w)
    padded = conv3x3_s2d_raw(x, w, extra_cols=7)
    assert padded.shape[2] == plain.shape[2] + 7
    np.testing.assert_array_equal(
        np.asarray(padded[:, :, : plain.shape[2]]), np.asarray(plain)
    )


def test_pool_from_raw_cpu_path():
    """On CPU, pool_from_raw must route to the XLA formulation."""
    from image_matching_tpu.ops.pallas.realign import pool_from_raw

    u = _rand_u(1, 12, 20, 4, seed=7)
    np.testing.assert_array_equal(
        np.asarray(pool_from_raw(u)), np.asarray(maxpool2x2_s2d_from_raw(u))
    )


def test_bad_block_rows_raises():
    import pytest

    u = _rand_u(1, 10, 12, 4)
    with pytest.raises(ValueError):
        maxpool_realign_pallas(u, block_rows=8, interpret=True)
