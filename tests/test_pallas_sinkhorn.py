"""Fused Pallas Sinkhorn vs the scan implementation (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.pallas.sinkhorn import fused_log_sinkhorn
from image_matching_tpu.ops.sinkhorn import (
    log_optimal_transport,
    log_sinkhorn,
)


def _problem(b=2, m=37, n=53, seed=0):
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.normal(size=(b, m, n)).astype(np.float32))
    log_mu = jnp.asarray(np.log(rng.dirichlet(np.ones(m), b)).astype(np.float32))
    log_nu = jnp.asarray(np.log(rng.dirichlet(np.ones(n), b)).astype(np.float32))
    return z, log_mu, log_nu


def test_matches_scan_unpadded_shapes():
    z, log_mu, log_nu = _problem()
    ref = log_sinkhorn(z, log_mu, log_nu, iters=20)
    out = fused_log_sinkhorn(z, log_mu, log_nu, iters=20, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matches_scan_tile_aligned():
    z, log_mu, log_nu = _problem(b=1, m=64, n=128, seed=1)
    ref = log_sinkhorn(z, log_mu, log_nu, iters=30)
    out = fused_log_sinkhorn(z, log_mu, log_nu, iters=30, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_marginals_satisfied():
    z, log_mu, log_nu = _problem(b=1, m=20, n=30, seed=2)
    out = fused_log_sinkhorn(z, log_mu, log_nu, iters=200, interpret=True)
    p = np.exp(np.asarray(out[0]))
    np.testing.assert_allclose(p.sum(1), np.exp(np.asarray(log_mu[0])),
                               atol=1e-4)
    np.testing.assert_allclose(p.sum(0), np.exp(np.asarray(log_nu[0])),
                               atol=1e-4)


def test_transport_pipeline_with_masks():
    """Full log_optimal_transport parity when the fused kernel replaces
    log_sinkhorn, including dustbins + padded-slot masks (the SuperGlue
    eval configuration)."""
    rng = np.random.default_rng(3)
    b, m, n = 2, 24, 24
    scores = jnp.asarray(rng.normal(size=(b, m, n)).astype(np.float32))
    mask0 = jnp.asarray(rng.uniform(size=(b, m)) < 0.8)
    mask1 = jnp.asarray(rng.uniform(size=(b, n)) < 0.8)
    bin_score = jnp.float32(0.7)

    ref = log_optimal_transport(scores, bin_score, iters=30,
                                mask0=mask0, mask1=mask1)

    import image_matching_tpu.ops.sinkhorn as sk

    orig = sk.log_sinkhorn
    sk.log_sinkhorn = lambda z, mu, nu, iters: fused_log_sinkhorn(
        z, mu, nu, iters, interpret=True
    )
    try:
        # jit cache keyed on the callable identity won't see the patch;
        # call the unjitted wrapped function
        out = log_optimal_transport.__wrapped__(
            scores, bin_score, iters=30, mask0=mask0, mask1=mask1
        )
    finally:
        sk.log_sinkhorn = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
