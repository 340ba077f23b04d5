"""Flash-attention Pallas kernel vs the XLA einsum oracle (interpreted on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_matching_tpu.ops.pallas.attention import (
    attention_reference,
    flash_attention,
)


def rand_qkv(rng, b, nq, nk, d):
    q = rng.normal(size=(b, nq, d)).astype(np.float32)
    k = rng.normal(size=(b, nk, d)).astype(np.float32)
    v = rng.normal(size=(b, nk, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestFlashAttention:
    def test_matches_reference_unmasked(self):
        rng = np.random.default_rng(0)
        q, k, v = rand_qkv(rng, 2, 256, 256, 64)
        mask = jnp.ones((2, 256), bool)
        out = flash_attention(q, k, v, mask)
        ref = attention_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_matches_reference_masked(self):
        rng = np.random.default_rng(1)
        q, k, v = rand_qkv(rng, 2, 128, 384, 32)
        mask = jnp.asarray(rng.uniform(size=(2, 384)) > 0.4)
        out = flash_attention(q, k, v, mask)
        ref = attention_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_unaligned_lengths_padded(self):
        rng = np.random.default_rng(2)
        q, k, v = rand_qkv(rng, 1, 200, 300, 64)
        mask = jnp.asarray(rng.uniform(size=(1, 300)) > 0.3)
        out = flash_attention(q, k, v, mask)
        ref = attention_reference(q, k, v, mask)
        assert out.shape == (1, 200, 64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16_inputs(self):
        rng = np.random.default_rng(3)
        q, k, v = rand_qkv(rng, 1, 128, 128, 64)
        q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        mask = jnp.ones((1, 128), bool)
        out = flash_attention(q, k, v, mask)
        ref = attention_reference(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )

    def test_gradients_match_reference(self):
        rng = np.random.default_rng(4)
        q, k, v = rand_qkv(rng, 1, 128, 128, 32)
        mask = jnp.asarray(rng.uniform(size=(1, 128)) > 0.3)

        def f_flash(q_, k_, v_):
            return jnp.sum(flash_attention(q_, k_, v_, mask) ** 2)

        def f_ref(q_, k_, v_):
            return jnp.sum(attention_reference(q_, k_, v_, mask) ** 2)

        gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_jit_and_vmap_compatible(self):
        rng = np.random.default_rng(5)
        q, k, v = rand_qkv(rng, 4, 128, 128, 32)
        mask = jnp.ones((4, 128), bool)
        out = jax.jit(lambda a, b, c, m: flash_attention(a, b, c, m))(q, k, v, mask)
        assert out.shape == (4, 128, 32)


class TestSuperGlueFlashParity:
    def test_model_outputs_match_einsum(self):
        """SuperGlue with attention_impl=flash must reproduce the einsum
        path end-to-end (same params)."""
        from image_matching_tpu.models.superglue import SuperGlue
        from tests.test_models import make_kpts

        rng = np.random.default_rng(6)
        kp0 = make_kpts(rng, 1, 32, 64, n_valid=24)
        kp1 = make_kpts(rng, 1, 32, 64, n_valid=28)
        kwargs = dict(
            descriptor_dim=64, keypoint_encoder=(32, 64),
            gnn_layers=2, sinkhorn_iterations=20,
        )
        m_e = SuperGlue(**kwargs, attention_impl="einsum")
        m_f = SuperGlue(**kwargs, attention_impl="flash")
        variables = m_e.init(jax.random.PRNGKey(0), kp0, kp1, (64, 64), (64, 64))
        out_e = m_e.apply(variables, kp0, kp1, (64, 64), (64, 64))
        out_f = m_f.apply(variables, kp0, kp1, (64, 64), (64, 64))
        np.testing.assert_allclose(
            np.asarray(out_e["log_coupling"]),
            np.asarray(out_f["log_coupling"]),
            atol=1e-3,
        )
        np.testing.assert_array_equal(
            np.asarray(out_e["matches0"]), np.asarray(out_f["matches0"])
        )


class TestOnepassAttention:
    """Single-pass whole-K/V kernel (ops/pallas/attention.py
    attention_onepass): logits computed once, no online-softmax state."""

    def test_matches_reference_masked(self):
        from image_matching_tpu.ops.pallas.attention import attention_onepass

        rng = np.random.default_rng(7)
        q, k, v = rand_qkv(rng, 2, 256, 384, 64)
        mask = jnp.asarray(rng.uniform(size=(2, 384)) > 0.4)
        out = attention_onepass(q, k, v, mask)
        ref = attention_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_unaligned_lengths_padded(self):
        from image_matching_tpu.ops.pallas.attention import attention_onepass

        rng = np.random.default_rng(8)
        q, k, v = rand_qkv(rng, 1, 200, 300, 64)
        mask = jnp.asarray(rng.uniform(size=(1, 300)) > 0.3)
        out = attention_onepass(q, k, v, mask)
        ref = attention_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_grad_matches_reference(self):
        from image_matching_tpu.ops.pallas.attention import attention_onepass

        rng = np.random.default_rng(9)
        q, k, v = rand_qkv(rng, 1, 128, 128, 32)
        mask = jnp.asarray(rng.uniform(size=(1, 128)) > 0.2)

        def loss(fn):
            return lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_, mask))

        gr = jax.grad(loss(attention_reference), (0, 1, 2))(q, k, v)
        go = jax.grad(loss(attention_onepass), (0, 1, 2))(q, k, v)
        for a, b in zip(gr, go):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5
            )

    def test_bf16_matches_reference(self):
        from image_matching_tpu.ops.pallas.attention import attention_onepass

        rng = np.random.default_rng(10)
        q, k, v = rand_qkv(rng, 2, 256, 256, 64)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        mask = jnp.asarray(rng.uniform(size=(2, 256)) > 0.1)
        out = attention_onepass(q, k, v, mask)
        ref = attention_reference(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=4e-3,
        )

    def test_model_outputs_match_einsum_onepass(self):
        """SuperGlue with attention_impl=onepass (packed-head kernel)
        must reproduce the einsum path end-to-end (same params)."""
        from image_matching_tpu.models.superglue import SuperGlue
        from tests.test_models import make_kpts

        rng = np.random.default_rng(11)
        kp0 = make_kpts(rng, 1, 32, 64, n_valid=24)
        kp1 = make_kpts(rng, 1, 32, 64, n_valid=28)
        kwargs = dict(
            descriptor_dim=64, keypoint_encoder=(32, 64),
            gnn_layers=2, sinkhorn_iterations=20,
        )
        m_e = SuperGlue(**kwargs, attention_impl="einsum")
        m_o = SuperGlue(**kwargs, attention_impl="onepass")
        variables = m_e.init(jax.random.PRNGKey(0), kp0, kp1, (64, 64), (64, 64))
        out_e = m_e.apply(variables, kp0, kp1, (64, 64), (64, 64))
        out_o = m_o.apply(variables, kp0, kp1, (64, 64), (64, 64))
        np.testing.assert_allclose(
            np.asarray(out_e["log_coupling"]),
            np.asarray(out_o["log_coupling"]),
            atol=1e-3,
        )
        np.testing.assert_array_equal(
            np.asarray(out_e["matches0"]), np.asarray(out_o["matches0"])
        )

    def test_onepass_heads_matches_reference(self):
        from image_matching_tpu.ops.pallas.attention import (
            attention_onepass_heads,
            attention_reference_heads,
        )

        rng = np.random.default_rng(12)
        q, k, v = rand_qkv(rng, 2, 200, 300, 256)
        mask = jnp.asarray(rng.uniform(size=(2, 300)) > 0.3)
        out = attention_onepass_heads(q, k, v, mask, num_heads=4)
        ref = attention_reference_heads(q, k, v, mask, num_heads=4)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_onepass_heads_grad_matches_reference(self):
        from image_matching_tpu.ops.pallas.attention import (
            attention_onepass_heads,
            attention_reference_heads,
        )

        rng = np.random.default_rng(13)
        q, k, v = rand_qkv(rng, 1, 128, 128, 128)
        mask = jnp.asarray(rng.uniform(size=(1, 128)) > 0.2)

        def loss(fn):
            return lambda q_, k_, v_: jnp.sum(
                fn(q_, k_, v_, mask, num_heads=4)
            )

        gr = jax.grad(loss(attention_reference_heads), (0, 1, 2))(q, k, v)
        go = jax.grad(loss(attention_onepass_heads), (0, 1, 2))(q, k, v)
        for a, b in zip(gr, go):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5
            )
