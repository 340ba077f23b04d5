"""Sequence registration: frames → pose graph → globally consistent
trajectory.

The missing multi-frame layer of the reference (its pipelines register
each source against one template independently; `PointTracker` only
chains descriptors). Here a sequence is registered pairwise
(consecutive + stride-K loop-closure edges), every pairwise similarity
becomes a pose-graph edge weighted by its inlier support, and
`optimize_pose_graph` solves the global trajectory — the BASELINE.json
config-5 pipeline, measurable by ATE against synthetic GT.
"""
from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.slam.pose_graph import (
    PoseGraph,
    matrix_to_similarity_params,
    optimize_pose_graph,
)


def sequence_edges(
    n_frames: int, strides: Sequence[int] = (1, 4)
) -> List[Tuple[int, int]]:
    """Edge list: consecutive plus longer-stride loop closures."""
    edges = []
    for s in strides:
        edges.extend((i, i + s) for i in range(0, n_frames - s))
    return edges


def register_sequence(
    register_fn: Callable,  # (frame_i, frame_j, key) -> RegistrationResult
    frames: Sequence[np.ndarray],  # list of (H, W, 1) float arrays
    key: jax.Array,
    strides: Sequence[int] = (1, 4),
    min_inliers: int = 8,
    batched: bool = False,
) -> PoseGraph:
    """Pairwise-register the edge list into a PoseGraph.

    Edge weight = sqrt(inlier count) for valid fits, 0 otherwise (the
    solver ignores zero-weight edges)."""
    n = len(frames)
    edges = sequence_edges(n, strides)
    src, dst, rel, weight = [], [], [], []
    for i, j in edges:
        key, k = jax.random.split(key)
        fi = jnp.asarray(frames[i])
        fj = jnp.asarray(frames[j])
        if batched:
            res = register_fn(fi[None], fj[None], k)
            valid = bool(res.fit.valid[0])
            mat = np.asarray(res.fit.matrix[0])
            n_inl = int(res.fit.num_inliers[0])
        else:
            res = register_fn(fi, fj, k)
            valid = bool(res.fit.valid)
            mat = np.asarray(res.fit.matrix)
            n_inl = int(res.fit.num_inliers)
        src.append(i)
        dst.append(j)
        # T_ij maps frame i -> frame j coords
        rel.append(np.asarray(matrix_to_similarity_params(jnp.asarray(mat))))
        ok = valid and n_inl >= min_inliers
        weight.append(np.sqrt(float(n_inl)) if ok else 0.0)
    return PoseGraph(
        src=jnp.asarray(np.asarray(src, np.int32)),
        dst=jnp.asarray(np.asarray(dst, np.int32)),
        rel=jnp.asarray(np.stack(rel).astype(np.float32)),
        weight=jnp.asarray(np.asarray(weight, np.float32)),
        num_frames=n,
    )


def solve_trajectory(
    graph: PoseGraph, iters: int = 200
) -> jax.Array:
    """(N, 4) world-from-frame similarity params (frame 0 = identity)."""
    return optimize_pose_graph(graph, iters=iters)
