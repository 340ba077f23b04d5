"""Ring attention + sharded Sinkhorn vs single-device oracles on the
8-device CPU mesh (SURVEY.md §5 long-context deliverables)."""
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.pallas.attention import attention_reference
from image_matching_tpu.ops.sinkhorn import log_sinkhorn
from image_matching_tpu.parallel import make_mesh
from image_matching_tpu.parallel.ring_attention import make_ring_attention
from image_matching_tpu.parallel.sharded_sinkhorn import (
    make_sharded_log_optimal_transport,
)


class TestRingAttention:
    def test_matches_single_device(self):
        mesh = make_mesh({"context": 8})
        rng = np.random.default_rng(0)
        b, n, d = 2, 256, 32  # 32 keypoints per device
        q = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
        mask = jnp.asarray(rng.uniform(size=(b, n)) > 0.3)

        attn = make_ring_attention(mesh, "context")
        out = attn(q, k, v, mask)
        ref = attention_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_jit_compiles_with_collectives(self):
        mesh = make_mesh({"context": 8})
        rng = np.random.default_rng(1)
        b, n, d = 1, 128, 16
        q = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
        mask = jnp.ones((b, n), bool)
        attn = jax.jit(make_ring_attention(mesh, "context"))
        out = attn(q, q, q, mask)
        ref = attention_reference(q, q, q, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestShardedSinkhorn:
    def test_matches_single_device(self):
        mesh = make_mesh({"context": 8})
        rng = np.random.default_rng(2)
        m, n = 64, 48  # m divisible by 8
        z = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
        log_mu = jnp.full((m,), -np.log(m), jnp.float32)
        log_nu = jnp.full((n,), -np.log(n), jnp.float32)

        ot = make_sharded_log_optimal_transport(mesh, iters=50)
        out = ot(z, log_mu, log_nu)
        ref = log_sinkhorn(z[None], log_mu[None], log_nu[None], 50)[0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_marginals_converge_sharded(self):
        mesh = make_mesh({"context": 8})
        rng = np.random.default_rng(3)
        m, n = 32, 32
        z = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
        log_mu = jnp.full((m,), -np.log(m), jnp.float32)
        log_nu = jnp.full((n,), -np.log(n), jnp.float32)
        out = np.asarray(
            make_sharded_log_optimal_transport(mesh, iters=200)(z, log_mu, log_nu)
        )
        p = np.exp(out)
        np.testing.assert_allclose(p.sum(1), 1.0 / m, rtol=1e-3)
        np.testing.assert_allclose(p.sum(0), 1.0 / n, rtol=1e-3)
