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


def refine_trajectory_with_tracks(
    tracks,
    trajectory: jax.Array,
    num_frames: int,
    iters: int = 300,
    min_track_length: int = 2,
):
    """Bundle-adjust a pose-graph trajectory against point tracks.

    `tracks` is `get_tracks(...)` output (models/tracker.py): per-track
    pixel observations across frames. Each track becomes a world
    landmark and poses+landmarks are jointly re-optimised with IRLS
    robust weighting (slam/bundle_adjustment.py) — descriptor-only
    tracks carry outright mismatches, so the robust kernel is load-
    bearing, not optional. Returns (poses, landmarks)."""
    from image_matching_tpu.slam.bundle_adjustment import (
        bundle_adjust_robust,
        tracks_to_ba_problem,
    )

    tracks = [t for t in tracks if len(t[1]) >= min_track_length]
    if not tracks:
        return trajectory, jnp.zeros((1, 2))
    n_obs = sum(len(t[1]) for t in tracks)
    capacity = -(-n_obs // 8) * 8  # pad to a lane-friendly multiple
    problem = tracks_to_ba_problem(tracks, num_frames, capacity)
    z, p, _ = bundle_adjust_robust(problem, init=trajectory, iters=iters)
    return z, p
