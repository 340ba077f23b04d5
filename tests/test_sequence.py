"""End-to-end sequence → pose graph → trajectory test (SIFT front end)."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.evaluation import corner_error, make_eval_pairs
from image_matching_tpu.features.registration import build_classical_registration_fn
from image_matching_tpu.slam import absolute_trajectory_error
from image_matching_tpu.slam.pose_graph import similarity_params_to_matrix
from image_matching_tpu.slam.sequence import (
    register_sequence,
    sequence_edges,
    solve_trajectory,
)


def make_sequence(rng, n_frames=8, h=160, w=160):
    from image_matching_tpu.evaluation import make_synthetic_sequence
    return make_synthetic_sequence(rng, n_frames=n_frames, h=h, w=w)


class TestSequenceEdges:
    def test_edge_list(self):
        e = sequence_edges(5, strides=(1, 2))
        assert (0, 1) in e and (3, 4) in e and (0, 2) in e and (2, 4) in e
        assert len(e) == 4 + 3


class TestSequencePipeline:
    def test_trajectory_recovery(self):
        rng = np.random.default_rng(0)
        frames, gt = make_sequence(rng, n_frames=8)
        register = jax.jit(build_classical_registration_fn("sift"))
        graph = register_sequence(
            register, frames, jax.random.PRNGKey(0), strides=(1, 2)
        )
        assert float(jnp.sum(graph.weight > 0)) >= 8  # most edges valid
        traj = solve_trajectory(graph, iters=300)
        # gauge: frame 0 anchored at identity; GT frame0 is (1,0,x0,y0) —
        # compare relative to frame 0 in both
        est = np.asarray(traj)
        ate = float(
            absolute_trajectory_error(
                jnp.asarray(est), jnp.asarray(gt), align=True
            )
        )
        assert ate < 3.0

    def test_relative_pose_consistency(self):
        """est trajectory must reproduce each strong edge's measurement."""
        rng = np.random.default_rng(1)
        frames, gt = make_sequence(rng, n_frames=6)
        register = jax.jit(build_classical_registration_fn("sift"))
        graph = register_sequence(
            register, frames, jax.random.PRNGKey(1), strides=(1,)
        )
        traj = np.asarray(solve_trajectory(graph, iters=300))
        mats = np.asarray(similarity_params_to_matrix(jnp.asarray(traj)))
        for e in range(graph.src.shape[0]):
            if float(graph.weight[e]) == 0:
                continue
            i, j = int(graph.src[e]), int(graph.dst[e])
            # S_i ≈ S_j ∘ T_ij: compare corner action of S_j^-1 S_i vs T_ij
            si = np.vstack([mats[i], [0, 0, 1]])
            sj = np.vstack([mats[j], [0, 0, 1]])
            t_est = (np.linalg.inv(sj) @ si)[:2]
            t_meas = np.asarray(
                similarity_params_to_matrix(graph.rel[e])
            )
            err = corner_error(t_est.astype(np.float32), t_meas, 160, 160)
            assert err < 2.5
