"""Full bundle adjustment: exact recovery, noise robustness, sharded parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from image_matching_tpu.slam.bundle_adjustment import (
    BAProblem,
    apply_similarity,
    ba_residuals,
    bundle_adjust,
    invert_similarity,
    make_sharded_bundle_adjuster,
    solve_landmarks,
    tracks_to_ba_problem,
)


def _make_problem(
    seed=0, n_frames=8, n_landmarks=48, obs_per_landmark=4, noise=0.0
):
    """Synthetic GT: random similarity poses + landmarks; observations
    u = S_i^{-1}(p_l) for a random subset of frames per landmark."""
    rng = np.random.default_rng(seed)
    theta = rng.uniform(-0.5, 0.5, n_frames)
    scale = rng.uniform(0.8, 1.25, n_frames)
    a = scale * np.cos(theta)
    b = scale * np.sin(theta)
    t = rng.uniform(-40, 40, (n_frames, 2))
    z_gt = np.stack([a, b, t[:, 0], t[:, 1]], axis=-1).astype(np.float32)
    z_gt[0] = [1.0, 0.0, 0.0, 0.0]  # anchor frame = identity

    p_gt = rng.uniform(0, 400, (n_landmarks, 2)).astype(np.float32)

    frames, lms, uvs = [], [], []
    z_inv = np.asarray(invert_similarity(jnp.asarray(z_gt)))
    for l in range(n_landmarks):
        for f in rng.choice(n_frames, obs_per_landmark, replace=False):
            u = np.asarray(
                apply_similarity(jnp.asarray(z_inv[f]), jnp.asarray(p_gt[l]))
            )
            u = u + rng.normal(0, noise, 2)
            frames.append(f)
            lms.append(l)
            uvs.append(u)
    m = len(frames)
    problem = BAProblem(
        obs_frame=jnp.asarray(np.asarray(frames, np.int32)),
        obs_landmark=jnp.asarray(np.asarray(lms, np.int32)),
        obs_uv=jnp.asarray(np.stack(uvs).astype(np.float32)),
        obs_weight=jnp.ones(m),
        num_frames=n_frames,
        num_landmarks=n_landmarks,
    )
    return problem, jnp.asarray(z_gt), jnp.asarray(p_gt)


def test_exact_recovery():
    problem, z_gt, p_gt = _make_problem()
    z, p = bundle_adjust(problem, iters=400)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_gt), atol=1e-3)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_gt), atol=5e-3)


def test_noise_stays_near_gt_and_residuals_shrink():
    problem, z_gt, p_gt = _make_problem(noise=0.5, obs_per_landmark=6)
    z0 = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (problem.num_frames, 1))
    r_init = ba_residuals(problem, z0, solve_landmarks(problem, z0))
    z, p = bundle_adjust(problem, iters=400)
    r_opt = ba_residuals(problem, z, p)
    assert float(jnp.sum(r_opt**2)) < float(jnp.sum(r_init**2))
    # translations within a few pixels of GT despite 0.5 px image noise
    err = np.linalg.norm(np.asarray(z[:, 2:] - z_gt[:, 2:]), axis=-1)
    assert err.max() < 3.0


def test_zero_weight_observations_ignored():
    problem, z_gt, _ = _make_problem()
    # append garbage observations with weight 0
    bad = BAProblem(
        obs_frame=jnp.concatenate(
            [problem.obs_frame, jnp.array([1, 2], jnp.int32)]
        ),
        obs_landmark=jnp.concatenate(
            [problem.obs_landmark, jnp.array([0, 1], jnp.int32)]
        ),
        obs_uv=jnp.concatenate(
            [problem.obs_uv, jnp.array([[9e3, 9e3], [-9e3, 9e3]])]
        ),
        obs_weight=jnp.concatenate([problem.obs_weight, jnp.zeros(2)]),
        num_frames=problem.num_frames,
        num_landmarks=problem.num_landmarks,
    )
    z_ref, p_ref = bundle_adjust(problem, iters=300)
    z_bad, p_bad = bundle_adjust(bad, iters=300)
    np.testing.assert_allclose(np.asarray(z_bad), np.asarray(z_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_bad), np.asarray(p_ref), atol=1e-4)


def test_landmark_backsubstitution_is_weighted_mean():
    problem, z_gt, _ = _make_problem()
    p = solve_landmarks(problem, z_gt)
    pred = apply_similarity(z_gt[problem.obs_frame], problem.obs_uv)
    l0 = problem.obs_landmark == 0
    manual = jnp.sum(jnp.where(l0[:, None], pred, 0.0), axis=0) / jnp.sum(l0)
    np.testing.assert_allclose(np.asarray(p[0]), np.asarray(manual), atol=1e-5)


def test_sharded_matches_single_device():
    problem, _, _ = _make_problem(n_landmarks=32, obs_per_landmark=4)
    m = int(problem.obs_frame.shape[0])
    pad = (-m) % 8
    pad_p = BAProblem(
        obs_frame=jnp.pad(problem.obs_frame, (0, pad)),
        obs_landmark=jnp.pad(problem.obs_landmark, (0, pad)),
        obs_uv=jnp.pad(problem.obs_uv, ((0, pad), (0, 0))),
        obs_weight=jnp.pad(problem.obs_weight, (0, pad)),
        num_frames=problem.num_frames,
        num_landmarks=problem.num_landmarks,
    )
    z_ref, p_ref = bundle_adjust(pad_p, iters=300)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    solver = make_sharded_bundle_adjuster(
        mesh, pad_p.num_frames, pad_p.num_landmarks, iters=300
    )
    z0 = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (pad_p.num_frames, 1))
    z_sh, p_sh = solver(
        pad_p.obs_frame, pad_p.obs_landmark, pad_p.obs_uv, pad_p.obs_weight, z0
    )
    # both converge to the same optimum; f32 CG reduction order differs
    np.testing.assert_allclose(np.asarray(z_sh), np.asarray(z_ref), atol=5e-3)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=5e-3)


def test_tracks_to_ba_problem_roundtrip():
    tracks = [
        (7, [(0, 1.0, 2.0), (1, 3.0, 4.0)]),
        (9, [(1, 5.0, 6.0), (2, 7.0, 8.0), (3, 9.0, 1.0)]),
    ]
    problem = tracks_to_ba_problem(tracks, num_frames=4, max_observations=8)
    assert problem.num_landmarks == 2
    assert int(jnp.sum(problem.obs_weight > 0)) == 5
    np.testing.assert_array_equal(
        np.asarray(problem.obs_frame[:5]), [0, 1, 1, 2, 3]
    )
    np.testing.assert_array_equal(
        np.asarray(problem.obs_landmark[:5]), [0, 0, 1, 1, 1]
    )
    with pytest.raises(ValueError):
        tracks_to_ba_problem(tracks, num_frames=4, max_observations=3)


def test_invert_similarity():
    z = jnp.array([1.2, -0.4, 10.0, -3.0])
    u = jnp.array([[5.0, 7.0], [0.0, 0.0], [-3.0, 2.0]])
    back = apply_similarity(invert_similarity(z), apply_similarity(z, u))
    np.testing.assert_allclose(np.asarray(back), np.asarray(u), atol=1e-5)


def test_refine_trajectory_with_tracks():
    from image_matching_tpu.slam.sequence import refine_trajectory_with_tracks

    problem, z_gt, p_gt = _make_problem(n_frames=6, n_landmarks=30)
    # regroup the observations into tracker-style track lists
    f = np.asarray(problem.obs_frame)
    l = np.asarray(problem.obs_landmark)
    uv = np.array(problem.obs_uv)
    tracks = []
    for lm in range(problem.num_landmarks):
        idx = np.nonzero(l == lm)[0]
        tracks.append((lm, [(int(f[i]), float(uv[i, 0]), float(uv[i, 1])) for i in idx]))
    # perturb the trajectory and let BA pull it back to GT
    rng = np.random.default_rng(3)
    z_init = np.asarray(z_gt) + rng.normal(0, 0.05, z_gt.shape).astype(np.float32)
    z_init[0] = np.asarray(z_gt[0])
    z, p = refine_trajectory_with_tracks(
        tracks, jnp.asarray(z_init), problem.num_frames, iters=400
    )
    err_init = np.abs(z_init - np.asarray(z_gt)).max()
    err_opt = np.abs(np.asarray(z) - np.asarray(z_gt)).max()
    assert err_opt < err_init * 0.05
    assert np.abs(np.asarray(p[:30]) - np.asarray(p_gt)).max() < 0.1


def test_refine_trajectory_no_tracks_passthrough():
    from image_matching_tpu.slam.sequence import refine_trajectory_with_tracks

    traj = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (4, 1))
    z, _ = refine_trajectory_with_tracks([], traj, 4)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(traj))


def test_robust_ba_rejects_outlier_observations():
    from image_matching_tpu.slam.bundle_adjustment import bundle_adjust_robust

    problem, z_gt, p_gt = _make_problem(
        n_frames=8, n_landmarks=40, obs_per_landmark=5, noise=0.3
    )
    # corrupt 20% of observations with gross association errors
    rng = np.random.default_rng(7)
    m = int(problem.obs_frame.shape[0])
    bad = rng.choice(m, m // 5, replace=False)
    uv = np.array(problem.obs_uv)
    uv[bad] += rng.uniform(30, 120, (len(bad), 2)) * rng.choice(
        [-1, 1], (len(bad), 2)
    )
    corrupted = problem.replace(obs_uv=jnp.asarray(uv))

    # init near GT (the pose-graph stage provides this in the pipeline)
    z_init = np.asarray(z_gt) + rng.normal(0, 0.02, z_gt.shape).astype(np.float32)
    z_init[0] = np.asarray(z_gt[0])

    z_plain, _ = bundle_adjust(corrupted, init=jnp.asarray(z_init), iters=300)
    z_rob, p_rob, w = bundle_adjust_robust(
        corrupted, init=jnp.asarray(z_init), iters=300
    )
    err_plain = np.abs(np.asarray(z_plain) - np.asarray(z_gt)).max()
    err_rob = np.abs(np.asarray(z_rob) - np.asarray(z_gt)).max()
    assert err_rob < err_plain * 0.25  # robust pass beats plain LSQ
    assert err_rob < 1.0
    # the corrupted observations end with (near-)zero weight
    w = np.asarray(w)
    assert np.median(w[bad]) < 0.2 * np.median(np.delete(w, bad))
