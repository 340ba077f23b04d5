"""Pose-graph optimization: exact recovery, noise robustness, sharded parity."""
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.parallel import make_mesh
from image_matching_tpu.slam import (
    PoseGraph,
    absolute_trajectory_error,
    compose_similarity,
    make_sharded_pose_graph_solver,
    matrix_to_similarity_params,
    optimize_pose_graph,
    similarity_params_to_matrix,
)


def random_pose(rng, max_angle=0.4, max_shift=30.0):
    ang = rng.uniform(-max_angle, max_angle)
    sc = rng.uniform(0.9, 1.1)
    return np.array(
        [np.cos(ang) * sc, np.sin(ang) * sc,
         rng.uniform(-max_shift, max_shift), rng.uniform(-max_shift, max_shift)],
        np.float32,
    )


def invert_params(z):
    a, b, tx, ty = z
    d = a * a + b * b
    ai, bi = a / d, -b / d
    return np.array(
        [ai, bi, -(ai * tx - bi * ty), -(bi * tx + ai * ty)], np.float32
    )


def build_graph(rng, n_frames, noise=0.0, extra_loops=8):
    """GT world poses + chain and loop-closure edges T_ij = S_j^-1 ∘ S_i."""
    gt = np.stack([random_pose(rng) for _ in range(n_frames)])
    gt[0] = [1, 0, 0, 0]  # anchor
    edges = [(i, i + 1) for i in range(n_frames - 1)]
    for _ in range(extra_loops):
        i, j = rng.choice(n_frames, 2, replace=False)
        edges.append((int(i), int(j)))
    src, dst, rel = [], [], []
    for i, j in edges:
        t = np.array(
            compose_similarity(
                jnp.asarray(invert_params(gt[j])), jnp.asarray(gt[i])
            )
        )
        t = t + rng.normal(0, noise, 4).astype(np.float32)
        src.append(i)
        dst.append(j)
        rel.append(t)
    graph = PoseGraph(
        src=jnp.asarray(np.asarray(src, np.int32)),
        dst=jnp.asarray(np.asarray(dst, np.int32)),
        rel=jnp.asarray(np.stack(rel)),
        weight=jnp.ones((len(edges),)),
        num_frames=n_frames,
    )
    return gt, graph


class TestParamAlgebra:
    def test_matrix_roundtrip(self):
        rng = np.random.default_rng(0)
        z = jnp.asarray(random_pose(rng))
        m = similarity_params_to_matrix(z)
        np.testing.assert_allclose(
            np.asarray(matrix_to_similarity_params(m)), np.asarray(z), rtol=1e-6
        )

    def test_compose_matches_matrix_product(self):
        rng = np.random.default_rng(1)
        z1 = jnp.asarray(random_pose(rng))
        z2 = jnp.asarray(random_pose(rng))
        zc = compose_similarity(z2, z1)
        m1 = np.vstack([np.asarray(similarity_params_to_matrix(z1)), [0, 0, 1]])
        m2 = np.vstack([np.asarray(similarity_params_to_matrix(z2)), [0, 0, 1]])
        np.testing.assert_allclose(
            np.asarray(similarity_params_to_matrix(zc)), (m2 @ m1)[:2], rtol=1e-5
        )


class TestPoseGraphOptimize:
    def test_exact_recovery_noiseless(self):
        rng = np.random.default_rng(2)
        gt, graph = build_graph(rng, n_frames=16)
        sol = np.asarray(optimize_pose_graph(graph, iters=200))
        # f32 normal equations: accuracy floor ~cond*eps, not exact
        np.testing.assert_allclose(sol, gt, atol=0.05)

    def test_noisy_loop_closure_beats_chain(self):
        """With odometry noise, loop closures must reduce drift vs
        chaining the edges (the whole point of global optimization)."""
        rng = np.random.default_rng(3)
        gt, graph = build_graph(rng, n_frames=24, noise=0.01, extra_loops=20)
        sol = jnp.asarray(optimize_pose_graph(graph, iters=300))
        ate_opt = float(absolute_trajectory_error(sol, jnp.asarray(gt), align=False))

        # chained estimate from the first 23 chain edges only
        chain = np.zeros((24, 4), np.float32)
        chain[0] = [1, 0, 0, 0]
        for e in range(23):
            i, j = int(graph.src[e]), int(graph.dst[e])
            # S_i = S_j ∘ T_ij  =>  S_j = S_i ∘ T_ij^-1
            t_inv = invert_params(np.asarray(graph.rel[e]))
            chain[j] = np.asarray(
                compose_similarity(jnp.asarray(chain[i]), jnp.asarray(t_inv))
            )
        ate_chain = float(
            absolute_trajectory_error(jnp.asarray(chain), jnp.asarray(gt), align=False)
        )
        assert ate_opt < ate_chain * 0.9
        assert ate_opt < 3.0

    def test_zero_weight_edges_ignored(self):
        rng = np.random.default_rng(4)
        gt, graph = build_graph(rng, n_frames=10)
        # append a poisoned edge with weight 0
        bad = PoseGraph(
            src=jnp.concatenate([graph.src, jnp.array([0], jnp.int32)]),
            dst=jnp.concatenate([graph.dst, jnp.array([5], jnp.int32)]),
            rel=jnp.concatenate([graph.rel, jnp.array([[50.0, 9, 999, -999]])]),
            weight=jnp.concatenate([graph.weight, jnp.array([0.0])]),
            num_frames=10,
        )
        sol = np.asarray(optimize_pose_graph(bad, iters=200))
        np.testing.assert_allclose(sol, gt, atol=0.05)


class TestShardedSolver:
    def test_matches_single_device(self):
        rng = np.random.default_rng(5)
        n_frames = 16
        gt, graph = build_graph(rng, n_frames=n_frames, noise=0.005, extra_loops=9)
        # pad edges to a multiple of 8 for sharding
        e = graph.src.shape[0]
        pad = (-e) % 8
        graph_p = PoseGraph(
            src=jnp.pad(graph.src, (0, pad)),
            dst=jnp.pad(graph.dst, (0, pad)),
            rel=jnp.pad(graph.rel, ((0, pad), (0, 0))),
            weight=jnp.pad(graph.weight, (0, pad)),
            num_frames=n_frames,
        )
        single = np.asarray(optimize_pose_graph(graph_p, iters=150))

        mesh = make_mesh({"data": 8})
        solver = make_sharded_pose_graph_solver(mesh, n_frames, iters=150)
        z0 = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n_frames, 1))
        sharded = np.asarray(
            solver(graph_p.src, graph_p.dst, graph_p.rel, graph_p.weight, z0)
        )
        np.testing.assert_allclose(sharded, single, atol=0.02)

    def test_ate_metric(self):
        z = jnp.asarray(np.array([[1, 0, 0, 0], [1, 0, 10, 0]], np.float32))
        g = jnp.asarray(np.array([[1, 0, 0, 0], [1, 0, 10, 1]], np.float32))
        ate = float(absolute_trajectory_error(z, g, align=False))
        np.testing.assert_allclose(ate, 0.5, atol=1e-5)
