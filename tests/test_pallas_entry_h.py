"""Fused H-s2d image entry conv kernel vs the XLA composition (interpret).

The kernel fuses conv3x3_s2dh_entry (ci=1) with the inference
bias+BN+ReLU epilogue (ops/pallas/entry_h.py); it accumulates in f32
and rounds once, so parity vs the bf16 XLA chain is up to one bf16
rounding of the epilogue value — the f32-oracle check pins that the
kernel is on the *accurate* side.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from image_matching_tpu.ops.pallas.entry_h import (
    _xla_reference,
    entry_h_fused,
    entry_h_fused_pallas,
)
from image_matching_tpu.ops.s2d_conv import conv3x3_s2dh_entry


def _inputs(b=2, h=64, w=128, co=64, seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(
        rng.normal(size=(b, h, w)).astype(np.float32), jnp.bfloat16
    )
    k = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, co)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1, 0.2, (2 * co,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(0, 0.2, (2 * co,)).astype(np.float32))
    return img, k, scale, shift


def _oracle(img, k, scale, shift):
    # the kernel (like the model path) computes with bf16-rounded weights;
    # the oracle rounds them identically but accumulates exactly in f32
    k = k.astype(jnp.bfloat16).astype(jnp.float32)
    y = conv3x3_s2dh_entry(img[..., None].astype(jnp.float32), k)
    y = np.asarray(y) * np.asarray(scale) + np.asarray(shift)
    return np.maximum(y, 0.0)


@pytest.mark.parametrize("block_rows", [16, 8])
@pytest.mark.parametrize("variant", ["stack_minor", "stack_major"])
def test_kernel_matches_f32_oracle(block_rows, variant):
    img, k, scale, shift = _inputs()
    got = np.asarray(
        entry_h_fused_pallas(
            img, k, scale, shift, block_rows=block_rows, variant=variant,
            interpret=True,
        ),
        np.float32,
    )
    oracle = _oracle(img, k, scale, shift)
    den = np.maximum(np.abs(oracle), 1.0)
    # one bf16 rounding of the fused epilogue value
    assert np.max(np.abs(got - oracle) / den) <= 2 ** -8


def test_kernel_at_least_as_accurate_as_xla_chain():
    img, k, scale, shift = _inputs(seed=3)
    oracle = _oracle(img, k, scale, shift)
    den = np.maximum(np.abs(oracle), 1.0)
    got = np.asarray(
        entry_h_fused_pallas(img, k, scale, shift, interpret=True),
        np.float32,
    )
    ref = np.asarray(_xla_reference(img, k, scale, shift), np.float32)
    assert np.max(np.abs(got - oracle) / den) <= np.max(
        np.abs(ref - oracle) / den
    ) + 1e-6


def test_dispatch_fallback_non_blocking_shapes():
    # W=120 not a lane multiple -> XLA path; result equals the reference
    img, k, scale, shift = _inputs(h=20, w=120, seed=5)
    got = entry_h_fused(img, k, scale, shift)
    ref = _xla_reference(img, k, scale, shift)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_dispatch_interpret_blocking_shape():
    img, k, scale, shift = _inputs(seed=7)
    got = np.asarray(
        entry_h_fused(img, k, scale, shift, interpret=True), np.float32
    )
    oracle = _oracle(img, k, scale, shift)
    den = np.maximum(np.abs(oracle), 1.0)
    assert np.max(np.abs(got - oracle) / den) <= 2 ** -8


def test_module_bn_fold_matches_batchnorm_chain():
    """S2DConvBNReLUH's fused entry path (BNParams fold -> entry_h_fused)
    must match the conv + bias + BatchNorm + ReLU composition on the
    same parameters and non-trivial running stats."""
    import jax
    from flax.core import unfreeze

    from image_matching_tpu.models.common import S2DConvBNReLUH

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(size=(2, 32, 80, 1)).astype(np.float32),
                    jnp.bfloat16)
    mod = S2DConvBNReLUH(16, "entry", dtype=jnp.bfloat16)
    v = unfreeze(mod.init(jax.random.PRNGKey(0), x))
    # non-default stats + affine so the fold is actually exercised
    v["params"]["Conv_0"]["kernel"] = jnp.asarray(
        rng.normal(0, 0.3, (3, 3, 1, 16)).astype(np.float32))
    v["params"]["Conv_0"]["bias"] = jnp.asarray(
        rng.normal(0, 0.2, (16,)).astype(np.float32))
    v["params"]["BatchNorm_0"]["scale"] = jnp.asarray(
        rng.normal(1, 0.2, (16,)).astype(np.float32))
    v["params"]["BatchNorm_0"]["bias"] = jnp.asarray(
        rng.normal(0, 0.2, (16,)).astype(np.float32))
    v["batch_stats"]["BatchNorm_0"]["mean"] = jnp.asarray(
        rng.normal(0, 0.5, (16,)).astype(np.float32))
    v["batch_stats"]["BatchNorm_0"]["var"] = jnp.asarray(
        rng.uniform(0.5, 2.0, (16,)).astype(np.float32))
    got = np.asarray(mod.apply(v, x), np.float32)

    k = v["params"]["Conv_0"]["kernel"]
    y = conv3x3_s2dh_entry(x.astype(jnp.float32),
                           k.astype(jnp.bfloat16).astype(jnp.float32))
    y = np.asarray(y) + np.tile(np.asarray(v["params"]["Conv_0"]["bias"]), 2)
    mu = np.tile(np.asarray(v["batch_stats"]["BatchNorm_0"]["mean"]), 2)
    var = np.tile(np.asarray(v["batch_stats"]["BatchNorm_0"]["var"]), 2)
    g = np.tile(np.asarray(v["params"]["BatchNorm_0"]["scale"]), 2)
    b = np.tile(np.asarray(v["params"]["BatchNorm_0"]["bias"]), 2)
    ref = np.maximum((y - mu) / np.sqrt(var + 1e-5) * g + b, 0.0)
    den = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / den) < 0.02  # bf16 rounding chain
