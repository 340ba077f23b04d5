"""Device mesh setup and sharding helpers.

The reference's only multi-device mechanism is single-process
`nn.DataParallel` (Train_model_frontend.py:293-299, model_wrap.py:59-61);
this module is its TPU-native replacement per SURVEY.md §2: one global
`jax.sharding.Mesh` with axes

  * ``data``    — batch-parallel (image pairs / HA warp stacks),
  * ``model``   — tensor-parallel (SuperGlue GNN feature dims),
  * ``context`` — sequence-parallel over the keypoint axis
                  (ring attention; see parallel/ring_attention.py).

XLA inserts the psum/all-gather collectives over ICI from the sharding
annotations — there is no hand-written NCCL analogue to port.
"""
from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Optional[Mapping[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from {axis_name: size}. Defaults to pure data
    parallelism over every visible device."""
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    sizes = tuple(axes.values())
    n = int(np.prod(sizes))
    if n != len(devices):
        raise ValueError(
            f"mesh axes {dict(axes)} need {n} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def make_data_mesh(batch_size: int) -> Mesh:
    """Data-parallel mesh over the largest device count dividing the batch."""
    n_dev = len(jax.devices())
    n = max(d for d in range(1, n_dev + 1) if batch_size % d == 0)
    return make_mesh({"data": n}, jax.devices()[:n])


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over `axis`, replicate the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put every leaf of a batch pytree with dim-0 sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim, axis)), batch
    )
