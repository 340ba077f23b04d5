"""Context-parallel SuperGlue (ring attention + sharded Sinkhorn +
distributed extraction) must reproduce the single-device model exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.models.superglue import SuperGlue
from image_matching_tpu.parallel import make_mesh
from image_matching_tpu.parallel.context_parallel import (
    make_context_parallel_superglue,
)
from tests.test_models import make_kpts


def setup(k=32, d=64, layers=4, iters=25, n_valid0=None, n_valid1=None):
    model = SuperGlue(
        descriptor_dim=d, keypoint_encoder=(32, d),
        gnn_layers=layers, sinkhorn_iterations=iters,
        match_threshold=0.2, dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    kp0 = make_kpts(rng, 2, k, d, n_valid=n_valid0)
    kp1 = make_kpts(rng, 2, k, d, n_valid=n_valid1)
    variables = model.init(jax.random.PRNGKey(0), kp0, kp1, (64, 64), (64, 64))
    return model, variables, kp0, kp1


class TestContextParallelSuperGlue:
    def test_exact_parity_full_masks(self):
        model, variables, kp0, kp1 = setup()
        ref = model.apply(variables, kp0, kp1, (64, 64), (64, 64))

        mesh = make_mesh({"context": 8})
        cp = make_context_parallel_superglue(
            mesh, gnn_layers=4, sinkhorn_iterations=25, match_threshold=0.2
        )
        m0, m1, s0, s1 = cp(variables, kp0, kp1, (64, 64), (64, 64))

        np.testing.assert_array_equal(np.asarray(m0), np.asarray(ref["matches0"]))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(ref["matches1"]))
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(ref["matching_scores0"]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(ref["matching_scores1"]), atol=1e-4
        )

    def test_parity_with_padding_masks(self):
        model, variables, kp0, kp1 = setup(n_valid0=20, n_valid1=26)
        ref = model.apply(variables, kp0, kp1, (64, 64), (64, 64))
        mesh = make_mesh({"context": 8})
        cp = make_context_parallel_superglue(
            mesh, gnn_layers=4, sinkhorn_iterations=25, match_threshold=0.2
        )
        m0, m1, s0, s1 = cp(variables, kp0, kp1, (64, 64), (64, 64))
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(ref["matches0"]))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(ref["matches1"]))

    def test_jit_compatible(self):
        model, variables, kp0, kp1 = setup(layers=2, iters=10)
        mesh = make_mesh({"context": 8})
        cp = make_context_parallel_superglue(
            mesh, gnn_layers=2, sinkhorn_iterations=10
        )
        fn = jax.jit(lambda v, a, b: cp(v, a, b, (64, 64), (64, 64)))
        m0, *_ = fn(variables, kp0, kp1)
        assert m0.shape == (2, 32)
