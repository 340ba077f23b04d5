"""Pallas im2col entry conv vs the XLA stride-2 formulation (interpret)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_matching_tpu.ops.pallas.entry_conv import (
    entry_conv,
    entry_conv_pallas,
)
from image_matching_tpu.ops.s2d_conv import (
    conv3x3_s2d_entry,
    depth_to_space,
    realign,
    space_to_depth,
)


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("ci,co", [(1, 8), (8, 16)])
def test_kernel_matches_xla_formulation(ci, co):
    x = _rand((2, 32, 48, ci), seed=ci)
    w = _rand((3, 3, ci, co), seed=co)
    ref = conv3x3_s2d_entry(x, w)
    got = entry_conv_pallas(x, w, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_kernel_matches_direct_conv():
    """Through the definition: equals space_to_depth(conv3x3(x, w))."""
    x = _rand((1, 16, 24, 4), seed=3)
    w = _rand((3, 3, 4, 8), seed=4)
    direct = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    ref = space_to_depth(direct)
    got = entry_conv_pallas(x, w, block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_block_rows_fallbacks():
    # H/2=6 → block_rows=2; H/2=5 → block_rows=1
    for h, seed in ((12, 5), (10, 6)):
        x = _rand((1, h, 20, 4), seed=seed)
        w = _rand((3, 3, 4, 8), seed=seed + 10)
        np.testing.assert_allclose(
            np.asarray(entry_conv(x, w, interpret=True)),
            np.asarray(conv3x3_s2d_entry(x, w)),
            atol=1e-4,
        )


def test_custom_vjp_matches_xla_grad():
    from image_matching_tpu.ops.pallas.entry_conv import _entry_conv_bwd

    x = _rand((1, 16, 24, 4), seed=7)
    w = _rand((3, 3, 4, 8), seed=8)
    g = _rand((1, 8, 12, 32), seed=9)
    _, ref_vjp = jax.vjp(conv3x3_s2d_entry, x, w)
    got = _entry_conv_bwd((x, w), g)
    for a, b in zip(got, ref_vjp(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_entry_conv_cpu_dispatch():
    x = _rand((1, 16, 24, 4), seed=11)
    w = _rand((3, 3, 4, 8), seed=12)
    np.testing.assert_allclose(
        np.asarray(entry_conv(x, w)),
        np.asarray(conv3x3_s2d_entry(x, w)),
        atol=1e-4,
    )
