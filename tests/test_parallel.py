"""Multi-device sharding tests on the 8-device virtual CPU mesh:
DP training step, DP+TP SuperGlue step, sharded inference."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from image_matching_tpu.models.superglue import SuperGlue
from image_matching_tpu.models.superpoint import SuperPointBN
from image_matching_tpu.parallel import (
    apply_param_sharding,
    data_sharding,
    make_mesh,
    shard_batch,
    superglue_param_sharding,
)
from image_matching_tpu.train import (
    SuperPointLossConfig,
    create_train_state,
    make_superpoint_train_step,
    make_superglue_train_step,
)
from image_matching_tpu.train.superglue_trainer import SuperGluePairConfig
from tests.test_train import synthetic_sp_batch


class TestMesh:
    def test_make_mesh_dp(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8

    def test_make_mesh_2d(self):
        mesh = make_mesh({"data": 4, "model": 2})
        assert mesh.shape == {"data": 4, "model": 2}


class TestDataParallelTraining:
    def test_superpoint_step_sharded(self):
        mesh = make_mesh({"data": 8})
        model = SuperPointBN(descriptor_dim=32)
        rng = np.random.default_rng(0)
        batch = synthetic_sp_batch(rng, b=8)
        batch = shard_batch(mesh, batch)
        state = create_train_state(
            jax.random.PRNGKey(0), model, (batch["image"],),
            tx=optax.adam(1e-3), init_kwargs={"train": True},
        )
        # replicate state across the mesh
        state = jax.device_put(
            state, NamedSharding(mesh, P())
        )
        step = make_superpoint_train_step(
            model,
            SuperPointLossConfig(num_matching_attempts=32,
                                 num_masked_non_matches_per_match=4),
            donate=False,
        )
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        # matches unsharded result
        state_local = jax.device_put(state, jax.devices()[0])
        batch_local = jax.device_put(batch, jax.devices()[0])
        _, metrics_local = step(state_local, batch_local, jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            float(metrics["loss"]), float(metrics_local["loss"]), rtol=2e-4
        )


class TestTensorParallelSuperGlue:
    def test_dp_tp_train_step(self):
        mesh = make_mesh({"data": 4, "model": 2})
        d = 32
        sp = SuperPointBN(descriptor_dim=d)
        img = jnp.zeros((1, 32, 32, 1))
        sp_vars = sp.init(jax.random.PRNGKey(0), img)
        sg = SuperGlue(
            descriptor_dim=d, keypoint_encoder=(32, d),
            gnn_layers=2, sinkhorn_iterations=5,
        )
        rng = np.random.default_rng(1)
        images = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 1)).astype(np.float32))
        cfg = SuperGluePairConfig(max_keypoints=16, keypoint_threshold=0.0)

        from image_matching_tpu.train.superglue_trainer import generate_pair

        kp0, kp1, *_ = generate_pair(jax.random.PRNGKey(1), sp, sp_vars, images, cfg)
        state = create_train_state(
            jax.random.PRNGKey(2), sg, (kp0, kp1, (32, 32), (32, 32)),
            tx=optax.adam(1e-4), init_kwargs={"train": True},
        )
        # TP placement of the GNN kernels, DP batch
        shardings = superglue_param_sharding({"k": state.params}, mesh)["k"]
        state = state.replace(params=apply_param_sharding(state.params, shardings))
        sp_vars_repl = jax.device_put(sp_vars, NamedSharding(mesh, P()))
        batch = {"image": jax.device_put(images, data_sharding(mesh, 4))}

        step = make_superglue_train_step(sg, sp, sp_vars_repl, cfg, donate=False)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))

    def test_tp_sharding_rules(self):
        mesh = make_mesh({"data": 4, "model": 2})
        d = 32
        sg = SuperGlue(descriptor_dim=d, keypoint_encoder=(32, d), gnn_layers=2,
                       sinkhorn_iterations=5)
        rng = np.random.default_rng(0)
        from tests.test_models import make_kpts

        kp = make_kpts(rng, 1, 8, d)
        variables = sg.init(jax.random.PRNGKey(0), kp, kp, (32, 32), (32, 32))
        shardings = superglue_param_sharding(variables, mesh)
        flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
        tp_count = 0
        for path, s in flat:
            path_str = "/".join(getattr(k, "key", str(k)) for k in path)
            if "proj_q" in path_str and path_str.endswith("kernel"):
                assert s.spec == P(None, "model"), path_str
                tp_count += 1
            if "merge" in path_str and path_str.endswith("kernel"):
                assert s.spec == P("model", None), path_str
                tp_count += 1
        assert tp_count >= 4  # 2 layers x (q + merge)
