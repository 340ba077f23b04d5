"""Torch-checkpoint conversion tests: numerical parity for the VGG
SuperPoint, structural + numerical spot checks for SuperGlue."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from image_matching_tpu.models.superglue import SuperGlue
from image_matching_tpu.models.superpoint import SuperPointVGG
from image_matching_tpu.utils.torch_convert import (
    convert_superglue,
    convert_superpoint_vgg,
)


def build_torch_vgg_state(rng):
    """Random state dict with the official MagicLeap naming/shapes."""
    import torch.nn as nn

    dims = {
        "conv1a": (64, 1), "conv1b": (64, 64),
        "conv2a": (64, 64), "conv2b": (64, 64),
        "conv3a": (128, 64), "conv3b": (128, 128),
        "conv4a": (128, 128), "conv4b": (128, 128),
        "convPa": (256, 128), "convDa": (256, 128),
    }
    state = {}
    gen = torch.Generator().manual_seed(0)
    for name, (o, i) in dims.items():
        k = 3
        state[f"{name}.weight"] = torch.randn(o, i, k, k, generator=gen) * 0.05
        state[f"{name}.bias"] = torch.randn(o, generator=gen) * 0.01
    state["convPb.weight"] = torch.randn(65, 256, 1, 1, generator=gen) * 0.05
    state["convPb.bias"] = torch.randn(65, generator=gen) * 0.01
    state["convDb.weight"] = torch.randn(256, 256, 1, 1, generator=gen) * 0.05
    state["convDb.bias"] = torch.randn(256, generator=gen) * 0.01
    return state


def torch_vgg_forward(state, x):
    """The published SuperPoint VGG forward, from the official naming."""
    import torch.nn.functional as F

    def conv(name, t, k=3):
        return F.conv2d(t, state[f"{name}.weight"], state[f"{name}.bias"],
                        padding=k // 2)

    t = x
    t = F.relu(conv("conv1a", t))
    t = F.relu(conv("conv1b", t))
    t = F.max_pool2d(t, 2)
    t = F.relu(conv("conv2a", t))
    t = F.relu(conv("conv2b", t))
    t = F.max_pool2d(t, 2)
    t = F.relu(conv("conv3a", t))
    t = F.relu(conv("conv3b", t))
    t = F.max_pool2d(t, 2)
    t = F.relu(conv("conv4a", t))
    t = F.relu(conv("conv4b", t))
    cpa = F.relu(conv("convPa", t))
    semi = conv("convPb", cpa, k=1)
    cda = F.relu(conv("convDa", t))
    desc = conv("convDb", cda, k=1)
    desc = desc / desc.norm(p=2, dim=1, keepdim=True)
    return semi, desc


class TestSuperPointVGGConversion:
    def test_forward_parity(self):
        rng = np.random.default_rng(0)
        state = build_torch_vgg_state(rng)
        np_state = {k: v.numpy() for k, v in state.items()}
        variables = convert_superpoint_vgg(np_state)

        img = rng.uniform(0, 1, (1, 32, 40, 1)).astype(np.float32)
        model = SuperPointVGG(descriptor_dim=256)
        out = model.apply(
            {"params": variables["params"]}, jnp.asarray(img)
        )

        with torch.no_grad():
            semi_t, desc_t = torch_vgg_forward(
                state, torch.from_numpy(img.transpose(0, 3, 1, 2))
            )
        np.testing.assert_allclose(
            np.asarray(out["semi"]),
            semi_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["desc_map"]),
            desc_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-5,
        )

    def test_module_prefix_stripped(self):
        state = build_torch_vgg_state(np.random.default_rng(1))
        np_state = {f"module.{k}": v.numpy() for k, v in state.items()}
        variables = convert_superpoint_vgg(np_state)
        assert "conv1a" in variables["params"]


def build_torch_superglue_state(d=64, layers=2, kenc=(32, 64)):
    gen = torch.Generator().manual_seed(0)
    state = {}

    def conv1d(prefix, o, i):
        state[f"{prefix}.weight"] = torch.randn(o, i, 1, generator=gen) * 0.1
        state[f"{prefix}.bias"] = torch.randn(o, generator=gen) * 0.01

    def bn(prefix, c):
        state[f"{prefix}.weight"] = torch.rand(c, generator=gen) + 0.5
        state[f"{prefix}.bias"] = torch.randn(c, generator=gen) * 0.01
        state[f"{prefix}.running_mean"] = torch.randn(c, generator=gen) * 0.1
        state[f"{prefix}.running_var"] = torch.rand(c, generator=gen) + 0.5
        state[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    # kenc MLP([3] + kenc + [d]): conv,bn,relu per hidden, final conv
    chans = [3, *kenc, d]
    idx = 0
    for i in range(1, len(chans)):
        conv1d(f"kenc.encoder.{idx}", chans[i], chans[i - 1])
        idx += 1
        if i < len(chans) - 1:
            bn(f"kenc.encoder.{idx}", chans[i])
            idx += 2  # BN + ReLU slots

    for li in range(layers):
        for pi in range(3):
            conv1d(f"gnn.layers.{li}.attn.proj.{pi}", d, d)
        conv1d(f"gnn.layers.{li}.attn.merge", d, d)
        # mlp [2d, 2d, d]
        conv1d(f"gnn.layers.{li}.mlp.0", 2 * d, 2 * d)
        bn(f"gnn.layers.{li}.mlp.1", 2 * d)
        conv1d(f"gnn.layers.{li}.mlp.3", d, 2 * d)
    conv1d("final_proj", d, d)
    state["bin_score"] = torch.tensor(1.0)
    return state


class TestSuperGlueConversion:
    def test_structure_matches_flax_init(self):
        state = build_torch_superglue_state()
        np_state = {k: v.numpy() for k, v in state.items()}
        variables = convert_superglue(np_state, gnn_layers=2)

        from tests.test_models import make_kpts

        rng = np.random.default_rng(0)
        kp = make_kpts(rng, 1, 8, 64)
        model = SuperGlue(
            descriptor_dim=64, keypoint_encoder=(32, 64),
            gnn_layers=2, sinkhorn_iterations=5,
        )
        ref_vars = model.init(jax.random.PRNGKey(0), kp, kp, (32, 32), (32, 32))

        # tree_map over both trees raises if structures differ; the lambda
        # checks shapes leaf-by-leaf
        same = jax.tree_util.tree_map(
            lambda a, b: np.shape(a) == np.shape(b),
            ref_vars["params"], variables["params"],
        )
        assert all(jax.tree_util.tree_leaves(same))

    def test_converted_model_runs(self):
        state = build_torch_superglue_state()
        np_state = {k: v.numpy() for k, v in state.items()}
        variables = convert_superglue(np_state, gnn_layers=2)

        from tests.test_models import make_kpts

        rng = np.random.default_rng(1)
        kp0 = make_kpts(rng, 1, 12, 64)
        kp1 = make_kpts(rng, 1, 12, 64)
        model = SuperGlue(
            descriptor_dim=64, keypoint_encoder=(32, 64),
            gnn_layers=2, sinkhorn_iterations=10,
        )
        out = model.apply(
            {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            },
            kp0, kp1, (32, 32), (32, 32),
        )
        assert np.isfinite(np.asarray(out["log_coupling"])).all()
