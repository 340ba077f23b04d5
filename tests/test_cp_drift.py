"""Drift guard for the second SuperGlue forward (VERDICT round-4 item 7).

`parallel/context_parallel.py` re-implements the SuperGlue forward from
raw param dicts. The numerical parity test
(tests/test_context_parallel_superglue.py) catches *value* drift, but
only at the shapes it runs; this test catches *structural* drift the
moment `models/superglue.py` grows (or renames) a parameter the CP
forward does not consume — e.g. if the fused-QKV evolution ever turns
the runtime concat into a single stored `proj_qkv` kernel, this fails
with the offending path instead of silently mis-matching.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_matching_tpu.models.superglue import SuperGlue
from image_matching_tpu.structs import Keypoints


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _cp_consumes(path: str, collection: str) -> bool:
    """Mirror of context_parallel_superglue_local's param reads."""
    import re

    if collection == "params":
        if path == "bin_score":
            return True
        if re.fullmatch(r"final_proj/(kernel|bias)", path):
            return True
        if re.fullmatch(
            r"kenc/(Dense_\d+/(kernel|bias)"
            r"|MaskedBatchNorm1d_\d+/(scale|bias))", path
        ):
            return True
        if re.fullmatch(
            r"gnn/layer_\d+_(self|cross)/"
            r"(attn/(proj_q|proj_k|proj_v|merge)/(kernel|bias)"
            r"|mlp/(Dense_\d+/(kernel|bias)"
            r"|MaskedBatchNorm1d_\d+/(scale|bias)))", path
        ):
            return True
        return False
    if collection == "batch_stats":
        if re.fullmatch(r"kenc/MaskedBatchNorm1d_\d+/(mean|var)", path):
            return True
        if re.fullmatch(
            r"gnn/layer_\d+_(self|cross)/mlp/"
            r"MaskedBatchNorm1d_\d+/(mean|var)", path
        ):
            return True
        return False
    return False


@pytest.mark.parametrize("layers", [2, 18])
def test_cp_consumes_every_superglue_param(layers):
    d = 64
    sg = SuperGlue(
        descriptor_dim=d, keypoint_encoder=(32, d), gnn_layers=layers,
        sinkhorn_iterations=5,
    )
    k = 16
    rng = np.random.default_rng(0)
    kp = Keypoints(
        xy=jnp.asarray(rng.uniform(0, 32, (1, k, 2)), jnp.float32),
        score=jnp.asarray(rng.uniform(0, 1, (1, k)), jnp.float32),
        mask=jnp.ones((1, k), bool),
        desc=jnp.asarray(rng.normal(size=(1, k, d)), jnp.float32),
    )
    variables = jax.jit(sg.init)(
        jax.random.PRNGKey(0), kp, kp, (32, 32), (32, 32)
    )
    for collection in ("params", "batch_stats"):
        leaves = jax.tree_util.tree_flatten_with_path(
            variables.get(collection, {})
        )[0]
        assert leaves, f"no {collection} leaves found"
        unconsumed = [
            _path_str(path) for path, _ in leaves
            if not _cp_consumes(_path_str(path), collection)
        ]
        assert not unconsumed, (
            f"SuperGlue {collection} leaves the context-parallel forward "
            f"(parallel/context_parallel.py) does not consume: "
            f"{unconsumed}. Update _seq_mlp/_attention_block (and this "
            f"test's mirror) together with the model."
        )
