"""Sinkhorn OT: marginal convergence, masked-padding equivalence, oracle parity."""
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops import log_optimal_transport
from image_matching_tpu.ops.sinkhorn import extract_matches_from_transport


def numpy_log_ot(scores, alpha, iters):
    """Independent numpy oracle for dustbin log-OT (standard algorithm:
    Sinkhorn in log domain with augmented dustbin row/col, Sarlin et al.
    CVPR 2020, eq. 8)."""
    m, n = scores.shape
    couplings = np.zeros((m + 1, n + 1))
    couplings[:m, :n] = scores
    couplings[m, :] = alpha
    couplings[:, n] = alpha
    norm = -np.log(m + n)
    log_mu = np.concatenate([np.full(m, norm), [np.log(n) + norm]])
    log_nu = np.concatenate([np.full(n, norm), [np.log(m) + norm]])

    def lse(x, axis):
        mx = x.max(axis=axis, keepdims=True)
        return (mx + np.log(np.exp(x - mx).sum(axis=axis, keepdims=True))).squeeze(axis)

    u = np.zeros(m + 1)
    v = np.zeros(n + 1)
    for _ in range(iters):
        u = log_mu - lse(couplings + v[None, :], 1)
        v = log_nu - lse(couplings + u[:, None], 0)
    return couplings + u[:, None] + v[None, :] - norm


class TestLogOptimalTransport:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        scores = rng.normal(size=(12, 9)).astype(np.float32)
        ours = np.asarray(
            log_optimal_transport(jnp.asarray(scores)[None], jnp.asarray(0.7), 50)
        )[0]
        ref = numpy_log_ot(scores.astype(np.float64), 0.7, 50)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_marginals_converge(self):
        rng = np.random.default_rng(1)
        m, n = 20, 15
        scores = rng.normal(size=(m, n)).astype(np.float32)
        z = np.asarray(
            log_optimal_transport(jnp.asarray(scores)[None], jnp.asarray(1.0), 200)
        )[0]
        p = np.exp(z)  # scaled by (m+n)
        # each valid row must sum to 1 (after the reference's m+n rescale)
        np.testing.assert_allclose(p[:m].sum(1), 1.0, rtol=1e-3)
        np.testing.assert_allclose(p[:, :n].sum(0), 1.0, rtol=1e-3)

    def test_masked_equals_cropped(self):
        """Padding slots with mask=False must reproduce the smaller
        unpadded problem exactly — the core static-shape guarantee."""
        rng = np.random.default_rng(2)
        m, n, mp, np_ = 10, 8, 16, 14
        scores_small = rng.normal(size=(m, n)).astype(np.float32)
        scores_big = rng.normal(size=(mp, np_)).astype(np.float32) * 100
        scores_big[:m, :n] = scores_small
        mask0 = np.zeros(mp, bool)
        mask0[:m] = True
        mask1 = np.zeros(np_, bool)
        mask1[:n] = True

        z_small = np.asarray(
            log_optimal_transport(jnp.asarray(scores_small)[None], jnp.asarray(0.5), 60)
        )[0]
        z_big = np.asarray(
            log_optimal_transport(
                jnp.asarray(scores_big)[None],
                jnp.asarray(0.5),
                60,
                mask0=jnp.asarray(mask0)[None],
                mask1=jnp.asarray(mask1)[None],
            )
        )[0]
        # valid block matches
        np.testing.assert_allclose(z_big[:m, :n], z_small[:m, :n], rtol=1e-3, atol=1e-4)
        # dustbin row/col over valid slots matches
        np.testing.assert_allclose(z_big[mp, :n], z_small[m, :n], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(z_big[:m, np_], z_small[:m, n], rtol=1e-3, atol=1e-4)
        # invalid slots carry ~zero probability mass
        assert np.exp(z_big[m:mp, :np_]).max() < 1e-6


class TestExtractMatches:
    def test_strong_diagonal_matches(self):
        m = n = 6
        scores = np.full((m, n), -5.0, dtype=np.float32)
        np.fill_diagonal(scores, 5.0)
        z = log_optimal_transport(jnp.asarray(scores)[None], jnp.asarray(0.0), 50)
        m0, m1, s0, s1 = extract_matches_from_transport(z, 0.2)
        assert (np.asarray(m0)[0] == np.arange(6)).all()
        assert (np.asarray(m1)[0] == np.arange(6)).all()
        assert (np.asarray(s0)[0] > 0.5).all()

    def test_unmatchable_goes_to_dustbin(self):
        scores = np.full((4, 4), -8.0, dtype=np.float32)
        z = log_optimal_transport(jnp.asarray(scores)[None], jnp.asarray(2.0), 50)
        m0, _, s0, _ = extract_matches_from_transport(z, 0.2)
        assert (np.asarray(m0)[0] == -1).all()

    def test_threshold_filters(self):
        m = n = 5
        scores = np.full((m, n), 0.0, dtype=np.float32)
        np.fill_diagonal(scores, 0.5)  # weak diagonal
        z = log_optimal_transport(jnp.asarray(scores)[None], jnp.asarray(0.3), 50)
        m0_hi, *_ = extract_matches_from_transport(z, 0.99)
        assert (np.asarray(m0_hi)[0] == -1).all()
