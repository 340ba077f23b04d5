"""Parameter sharding rules (tensor parallelism for the SuperGlue GNN).

The reference has no tensor parallelism (SURVEY.md §2 parallelism table);
here the GNN's projection/MLP kernels are sharded over a ``model`` mesh
axis Megatron-style: q/k/v projections split the head dimension
(column-parallel), the attention merge and MLP output are row-parallel.
With GSPMD it is enough to place the kernels — XLA inserts the psum
after row-parallel matmuls automatically.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# kernel name fragments -> PartitionSpec for (in_features, out_features)
_COLUMN_PARALLEL = ("proj_q", "proj_k", "proj_v")  # split output dim
_ROW_PARALLEL = ("merge",)  # split input dim


def _spec_for_path(path: str, ndim: int, model_axis: str) -> P:
    if ndim != 2:  # biases / norms replicated
        return P()
    if any(f"{frag}/" in path or path.endswith(frag + "/kernel") for frag in _COLUMN_PARALLEL):
        return P(None, model_axis)
    if any(f"{frag}/" in path or path.endswith(frag + "/kernel") for frag in _ROW_PARALLEL):
        return P(model_axis, None)
    # GNN MLP: first Dense column-parallel, second row-parallel
    if "/mlp/" in path and path.endswith("Dense_0/kernel"):
        return P(None, model_axis)
    if "/mlp/" in path and path.endswith("Dense_1/kernel"):
        return P(model_axis, None)
    return P()


def superglue_param_sharding(
    variables: Any, mesh: Mesh, model_axis: str = "model"
):
    """PyTree of NamedShardings matching `variables` for TP placement."""
    if model_axis not in mesh.axis_names or mesh.shape[model_axis] == 1:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), variables
        )

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    shardings = []
    for path, leaf in flat:
        path_str = "/".join(
            getattr(k, "key", str(k)) for k in path
        )
        shardings.append(
            NamedSharding(mesh, _spec_for_path(path_str, leaf.ndim, model_axis))
        )
    return jax.tree_util.tree_unflatten(treedef, shardings)


def apply_param_sharding(variables: Any, shardings: Any):
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)
