"""Pipeline-parallel SuperGlue (GNN staged over a pipe mesh axis with a
GPipe microbatch schedule) must reproduce the single-device model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_matching_tpu.models.superglue import SuperGlue
from jax.sharding import Mesh

from image_matching_tpu.parallel.pipeline import (
    make_pipelined_superglue,
    stack_gnn_params,
)
from tests.test_models import make_kpts


def setup(b=4, k=32, d=64, layers=6, iters=25, n_valid0=None, n_valid1=None):
    model = SuperGlue(
        descriptor_dim=d, keypoint_encoder=(32, d),
        gnn_layers=layers, sinkhorn_iterations=iters,
        match_threshold=0.2, dtype=jnp.float32, attention_impl="einsum",
    )
    rng = np.random.default_rng(0)
    kp0 = make_kpts(rng, b, k, d, n_valid=n_valid0)
    kp1 = make_kpts(rng, b, k, d, n_valid=n_valid1)
    variables = model.init(jax.random.PRNGKey(0), kp0, kp1, (64, 64), (64, 64))
    return model, variables, kp0, kp1


def assert_match(out, ref):
    np.testing.assert_array_equal(
        np.asarray(out["matches0"]), np.asarray(ref["matches0"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["matches1"]), np.asarray(ref["matches1"])
    )
    np.testing.assert_allclose(
        np.asarray(out["matching_scores0"]),
        np.asarray(ref["matching_scores0"]), atol=1e-4,
    )


class TestStacking:
    def test_stacked_shapes(self):
        model, variables, *_ = setup(layers=6)
        p, s, cross = stack_gnn_params(variables, 6)
        assert cross.shape == (6,)
        assert bool(cross[1]) and not bool(cross[0])
        leaf = p["attn"]["proj_q"]["kernel"]
        assert leaf.shape[0] == 6
        assert s["mlp"]["MaskedBatchNorm1d_0"]["mean"].shape[0] == 6


class TestPipelinedSuperGlue:
    @pytest.mark.parametrize("stages,micro", [(2, 2), (3, 4), (1, 1)])
    def test_parity_full_masks(self, stages, micro):
        model, variables, kp0, kp1 = setup(layers=6, b=4)
        ref = model.apply(variables, kp0, kp1, (64, 64), (64, 64))
        mesh = Mesh(np.array(jax.devices()[:stages]), ("pipe",))
        pp = make_pipelined_superglue(
            mesh, gnn_layers=6, sinkhorn_iterations=25,
            match_threshold=0.2, num_microbatches=micro,
        )
        out = pp(variables, kp0, kp1, (64, 64), (64, 64))
        assert_match(out, ref)

    def test_parity_with_padding_masks(self):
        model, variables, kp0, kp1 = setup(layers=6, n_valid0=20, n_valid1=26)
        ref = model.apply(variables, kp0, kp1, (64, 64), (64, 64))
        mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
        pp = make_pipelined_superglue(
            mesh, gnn_layers=6, sinkhorn_iterations=25, num_microbatches=2
        )
        out = pp(variables, kp0, kp1, (64, 64), (64, 64))
        assert_match(out, ref)

    def test_jit_and_composes_with_data_axis(self):
        model, variables, kp0, kp1 = setup(layers=2, iters=10)
        mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
        pp = make_pipelined_superglue(
            mesh, gnn_layers=2, sinkhorn_iterations=10, num_microbatches=2
        )
        fn = jax.jit(lambda v, a, b: pp(v, a, b, (64, 64), (64, 64)))
        out = fn(variables, kp0, kp1)
        assert out["matches0"].shape == (4, 32)

    def test_rejects_bad_divisibility(self):
        mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
        with pytest.raises(ValueError):
            make_pipelined_superglue(mesh, gnn_layers=6)
