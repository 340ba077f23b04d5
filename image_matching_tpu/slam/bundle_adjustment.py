"""Full bundle adjustment: joint poses + landmark structure, Schur solve.

Extends the similarity pose graph (pose_graph.py) to the complete
BASELINE.json north star: frames carry similarity poses S_i, tracked
image points become *landmarks* p_l in the common world frame, and both
are optimised jointly over all observations — the multi-frame structure
the reference never builds (its `PointTracker`, model_wrap.py:355-544,
only chains descriptors; each pair is registered independently).

Formulation. Pose z_i = (a, b, tx, ty) ⇒ S_i(u) = [[a,-b],[b,a]] u + t,
which is LINEAR in z_i. An observation m of landmark l in frame f at
pixel u_m contributes the residual

    r_m = A(u_m) z_f − p_l,   A(u) = [[u_x, −u_y, 1, 0],
                                      [u_y,  u_x, 0, 1]]  (2×4),

linear in BOTH unknowns, so full BA here is an exact sparse linear
least-squares problem. Gauge (one global similarity) is fixed by an
anchor prior on frame 0.

Solve: eliminate landmarks by Schur complement. The landmark block of
the normal matrix is diagonal — H_pp = c_l·I₂ with c_l = Σ_{m∈l} w_m² —
so the reduced camera system

    (H_zz − H_zp H_pp⁻¹ H_pz + λ_anchor e₀e₀ᵀ) z = λ_anchor z₀*

is applied matrix-free inside conjugate gradients: one matvec is a
gather of poses to observations, a segment-sum over landmarks, and a
scatter-add back to poses. Landmarks back-substitute in closed form as
the weighted mean of their predicted world points.

Distribution: observations shard over a mesh axis; each CG matvec
psum-reduces the landmark segment-sums and the pose-block scatter —
exactly the "Schur-complement reduced camera system via psum"
collective pattern called for by BASELINE.json. Verified sharded ==
unsharded in tests/test_bundle_adjustment.py.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P


@struct.dataclass
class BAProblem:
    """Observation list (fixed capacity, masked by weight == 0).

    obs_frame, obs_landmark: (M,) int32 indices; obs_uv: (M, 2) pixel
    coords of the landmark seen in that frame; obs_weight: (M,) float
    (0 = padding / outlier)."""

    obs_frame: jax.Array
    obs_landmark: jax.Array
    obs_uv: jax.Array
    obs_weight: jax.Array
    num_frames: int = struct.field(pytree_node=False, default=0)
    num_landmarks: int = struct.field(pytree_node=False, default=0)


def apply_similarity(z: jax.Array, uv: jax.Array) -> jax.Array:
    """S_z(uv) for params (..., 4) applied to points (..., 2)."""
    a, b, tx, ty = z[..., 0], z[..., 1], z[..., 2], z[..., 3]
    x, y = uv[..., 0], uv[..., 1]
    return jnp.stack([a * x - b * y + tx, b * x + a * y + ty], axis=-1)


def invert_similarity(z: jax.Array) -> jax.Array:
    """Params of S⁻¹: conjugate/|s|² rotation, t' = −R⁻¹ t."""
    a, b, tx, ty = z[..., 0], z[..., 1], z[..., 2], z[..., 3]
    s2 = jnp.maximum(a * a + b * b, 1e-12)
    ia, ib = a / s2, -b / s2
    itx = -(ia * tx - ib * ty)
    ity = -(ib * tx + ia * ty)
    return jnp.stack([ia, ib, itx, ity], axis=-1)


def _obs_matrix(uv: jax.Array) -> jax.Array:
    """(M, 2, 4) A(u) with A(u) z = S_z(u)."""
    x, y = uv[..., 0], uv[..., 1]
    o = jnp.ones_like(x)
    zr = jnp.zeros_like(x)
    row0 = jnp.stack([x, -y, o, zr], axis=-1)
    row1 = jnp.stack([y, x, zr, o], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _landmark_weight(problem: BAProblem) -> jax.Array:
    """(L,) c_l = Σ w² over each landmark's observations."""
    w2 = problem.obs_weight ** 2
    return jnp.zeros(problem.num_landmarks).at[problem.obs_landmark].add(w2)


def solve_landmarks(problem: BAProblem, z: jax.Array) -> jax.Array:
    """Closed-form back-substitution: (L, 2) weighted mean of S_f(u_m)
    over each landmark's observations (zero for unobserved landmarks)."""
    w2 = (problem.obs_weight ** 2)[:, None]
    pred = apply_similarity(z[problem.obs_frame], problem.obs_uv)
    num = jnp.zeros((problem.num_landmarks, 2)).at[problem.obs_landmark].add(
        w2 * pred
    )
    den = _landmark_weight(problem)[:, None]
    return num / jnp.maximum(den, 1e-12)


def robust_landmarks(
    problem: BAProblem, z: jax.Array, weiszfeld_iters: int = 8
) -> jax.Array:
    """(L, 2) geometric-median landmark estimates (Weiszfeld iteration).

    The weighted-mean back-substitution has zero breakdown — one gross
    mis-association drags the landmark and then every observation of
    that track looks bad. The geometric median tolerates up to half the
    track being wrong, which is what the IRLS reweighting needs."""
    w2 = (problem.obs_weight ** 2)[:, None]
    pred = apply_similarity(z[problem.obs_frame], problem.obs_uv)
    lm = problem.obs_landmark
    nl = problem.num_landmarks

    def seg_mean(ww):
        num = jnp.zeros((nl, 2)).at[lm].add(ww * pred)
        den = jnp.zeros((nl, 1)).at[lm].add(ww)
        return num / jnp.maximum(den, 1e-12)

    p = seg_mean(w2)

    def body(p, _):
        d = jnp.linalg.norm(pred - p[lm], axis=-1, keepdims=True)
        return seg_mean(w2 / jnp.maximum(d, 1.0)), None

    p, _ = jax.lax.scan(body, p, None, length=weiszfeld_iters)
    return p


def ba_residuals(
    problem: BAProblem, z: jax.Array, landmarks: jax.Array
) -> jax.Array:
    """(M, 2) weighted reprojection residuals in world units."""
    pred = apply_similarity(z[problem.obs_frame], problem.obs_uv)
    return (pred - landmarks[problem.obs_landmark]) * problem.obs_weight[:, None]


def _schur_matvec(
    v: jax.Array, problem: BAProblem, inv_c: jax.Array, anchor_weight: float
) -> jax.Array:
    """(H_zz − H_zp H_pp⁻¹ H_pz) v + anchor prior, matrix-free."""
    amat = _obs_matrix(problem.obs_uv)  # (M, 2, 4)
    w2 = (problem.obs_weight ** 2)[:, None]
    y = jnp.einsum("mij,mj->mi", amat, v[problem.obs_frame])  # A v  (M, 2)

    # H_zz v: scatter w² Aᵀ (A v) to frames
    out = jnp.zeros_like(v).at[problem.obs_frame].add(
        jnp.einsum("mij,mi->mj", amat, w2 * y)
    )
    # Schur correction −H_zp H_pp⁻¹ H_pz v. With q_l = c_l⁻¹ Σ_{m∈l} w² y_m
    # (the weighted-mean projection), the correction is −Σ w² Aᵀ q_{l_m}.
    q = jnp.zeros((inv_c.shape[0], 2)).at[problem.obs_landmark].add(w2 * y)
    q = q * inv_c[:, None]
    out = out.at[problem.obs_frame].add(
        jnp.einsum("mij,mi->mj", amat, -w2 * q[problem.obs_landmark])
    )
    return out.at[0].add(anchor_weight * v[0])


def _schur_diag(
    problem: BAProblem, num_frames: int, anchor_weight: float
) -> jax.Array:
    """Jacobi preconditioner ≈ diag(H_zz): per obs w²·(|u|², |u|², 1, 1)."""
    u2 = jnp.sum(problem.obs_uv ** 2, axis=-1)
    w2 = problem.obs_weight ** 2
    per_obs = jnp.stack([u2, u2, jnp.ones_like(u2), jnp.ones_like(u2)], -1)
    diag = jnp.zeros((num_frames, 4)).at[problem.obs_frame].add(
        w2[:, None] * per_obs
    )
    return jnp.maximum(diag.at[0].add(anchor_weight), 1e-8)


def _solve_linear(
    problem: BAProblem, z0: jax.Array, iters: int, anchor_weight: float
) -> jax.Array:
    """One exact linear solve of the reduced camera system (poses only).

    Normalises coordinates first: raw pixel magnitudes make the reduced
    system's condition number ~|u|⁴ (rotation vs translation columns),
    which stalls f32 CG. u' = u/s with z' = (a, b, t/s) is an exact
    reparameterisation; solve there and unscale the translations."""
    n = problem.num_frames
    w2 = problem.obs_weight ** 2
    scale = jnp.sqrt(
        jnp.sum(w2 * jnp.sum(problem.obs_uv ** 2, -1))
        / jnp.maximum(jnp.sum(w2), 1e-12)
    )
    scale = jnp.maximum(scale, 1e-6)
    sp = problem.replace(obs_uv=problem.obs_uv / scale)
    tscale = jnp.array([1.0, 1.0, scale, scale])
    z0s = z0 / tscale

    inv_c = 1.0 / jnp.maximum(_landmark_weight(sp), 1e-12)
    matvec = lambda v: _schur_matvec(v, sp, inv_c, anchor_weight)
    rhs = jnp.zeros((n, 4)).at[0].add(anchor_weight * z0s[0])
    diag = _schur_diag(sp, n, anchor_weight)

    zs, _ = jax.scipy.sparse.linalg.cg(
        matvec, rhs, x0=z0s, maxiter=iters, tol=1e-12, M=lambda v: v / diag
    )
    return zs * tscale


@partial(jax.jit, static_argnames=("iters",))
def bundle_adjust(
    problem: BAProblem,
    init: Optional[jax.Array] = None,
    iters: int = 200,
    anchor_weight: float = 10.0,
) -> Tuple[jax.Array, jax.Array]:
    """Jointly optimal (poses (N, 4), landmarks (L, 2)).

    Frame 0 is anchored to `init[0]` (identity when init is None). The
    problem is linear, so CG on the reduced camera system converges to
    the exact joint optimum — no relinearisation loop needed."""
    n = problem.num_frames
    identity = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1))
    z0 = init if init is not None else identity
    z = _solve_linear(problem, z0, iters, anchor_weight)
    return z, solve_landmarks(problem, z)


@partial(jax.jit, static_argnames=("iters", "rounds"))
def bundle_adjust_robust(
    problem: BAProblem,
    init: Optional[jax.Array] = None,
    iters: int = 200,
    rounds: int = 4,
    anchor_weight: float = 10.0,
    huber_k: float = 3.0,
    cut_k: float = 6.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """IRLS bundle adjustment for outlier-contaminated tracks.

    Real track sets are dirty — the PointTracker matches by descriptor
    alone (model_wrap.py:380-423 semantics), so wrong associations
    survive into the observation list and plain least squares follows
    them. Weights come from residuals at the CURRENT iterate *before*
    each solve (standard IRLS): with a decent init the gross outliers
    are flagged immediately instead of first dragging the solution into
    their basin and then being "confirmed" by reweighting. Each round:
    residual norms at current poses → robust scale s = 1.4826·median
    (MAD) → Huber down-weighting at huber_k·s, hard zero beyond
    cut_k·s → exact linear solve. Returns (poses, landmarks,
    final_weights); observations driven to weight 0 are the rejected
    outliers (they may rejoin in later rounds — the scale is estimated
    over all real observations each time)."""
    n = problem.num_frames
    identity = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1))
    z = init if init is not None else identity
    w0 = problem.obs_weight
    real = w0 > 0
    prob = problem

    for _ in range(rounds):
        p = robust_landmarks(prob, z)
        pred = apply_similarity(z[problem.obs_frame], problem.obs_uv)
        rn = jnp.linalg.norm(pred - p[problem.obs_landmark], axis=-1)
        s = 1.4826 * jnp.nanmedian(jnp.where(real, rn, jnp.nan))
        s = jnp.maximum(jnp.nan_to_num(s, nan=1.0), 0.5)
        robust = jnp.minimum(1.0, huber_k * s / jnp.maximum(rn, 1e-9))
        robust = jnp.where(rn > cut_k * s, 0.0, robust)
        prob = problem.replace(obs_weight=w0 * jnp.sqrt(robust))
        z = _solve_linear(prob, z, iters, anchor_weight)

    return z, solve_landmarks(prob, z), prob.obs_weight


def make_sharded_bundle_adjuster(
    mesh: Mesh,
    num_frames: int,
    num_landmarks: int,
    iters: int = 200,
    axis_name: str = "data",
    anchor_weight: float = 10.0,
):
    """Observation-sharded BA: each device owns M/P observations; every
    CG matvec psum-reduces (a) the landmark segment-sums (L, 2) and
    (b) the pose scatter (N, 4) — the distributed Schur pattern.

    Returned fn: (obs_frame, obs_landmark, obs_uv, obs_weight) sharded
    over the observation axis + replicated init → replicated
    (poses, landmarks)."""
    from jax.experimental.shard_map import shard_map

    def local_pieces(v, frame, landmark, uv, weight):
        amat = _obs_matrix(uv)
        w2 = (weight ** 2)[:, None]
        y = jnp.einsum("mij,mj->mi", amat, v[frame])
        out = jnp.zeros_like(v).at[frame].add(
            jnp.einsum("mij,mi->mj", amat, w2 * y)
        )
        g = jnp.zeros((num_landmarks, 2)).at[landmark].add(w2 * y)
        return out, g

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(axis_name), P(axis_name), P(axis_name, None), P(axis_name),
            P(None, None),
        ),
        out_specs=(P(None, None), P(None, None)),
        check_rep=False,
    )
    def solve(frame, landmark, uv, weight, z0):
        w2 = weight ** 2
        # coordinate normalisation (see bundle_adjust), reduced globally
        scale = jnp.sqrt(
            jax.lax.psum(jnp.sum(w2 * jnp.sum(uv ** 2, -1)), axis_name)
            / jnp.maximum(jax.lax.psum(jnp.sum(w2), axis_name), 1e-12)
        )
        scale = jnp.maximum(scale, 1e-6)
        uv = uv / scale
        tscale = jnp.array([1.0, 1.0, scale, scale])
        z0 = z0 / tscale

        c = jax.lax.psum(
            jnp.zeros(num_landmarks).at[landmark].add(w2), axis_name
        )
        inv_c = 1.0 / jnp.maximum(c, 1e-12)

        def matvec(v):
            out, g_local = local_pieces(v, frame, landmark, uv, weight)
            q = jax.lax.psum(g_local, axis_name) * inv_c[:, None]
            amat = _obs_matrix(uv)
            w2c = w2[:, None]
            out = out.at[frame].add(
                jnp.einsum("mij,mi->mj", amat, -w2c * q[landmark])
            )
            out = jax.lax.psum(out, axis_name)
            return out.at[0].add(anchor_weight * v[0])

        rhs = jnp.zeros((num_frames, 4)).at[0].add(anchor_weight * z0[0])
        u2 = jnp.sum(uv ** 2, axis=-1)
        per_obs = jnp.stack([u2, u2, jnp.ones_like(u2), jnp.ones_like(u2)], -1)
        diag = jax.lax.psum(
            jnp.zeros((num_frames, 4)).at[frame].add(w2[:, None] * per_obs),
            axis_name,
        )
        diag = jnp.maximum(diag.at[0].add(anchor_weight), 1e-8)
        zs, _ = jax.scipy.sparse.linalg.cg(
            matvec, rhs, x0=z0, maxiter=iters, tol=1e-12, M=lambda v: v / diag
        )
        z = zs * tscale
        uv_raw = uv * scale
        # back-substitute landmarks with one more psum
        pred = apply_similarity(z[frame], uv_raw)
        num = jax.lax.psum(
            jnp.zeros((num_landmarks, 2)).at[landmark].add(w2[:, None] * pred),
            axis_name,
        )
        return z, num * inv_c[:, None]

    return solve


def tracks_to_ba_problem(
    tracks,
    num_frames: int,
    max_observations: int,
    weight: float = 1.0,
) -> BAProblem:
    """Convert `get_tracks` output ([(tid, [(frame, x, y), ...]), ...])
    into a fixed-capacity BAProblem (host-side assembly)."""
    import numpy as np

    frames, lms, uvs, ws = [], [], [], []
    for lm_idx, (_, obs) in enumerate(tracks):
        for f, x, y in obs:
            frames.append(f)
            lms.append(lm_idx)
            uvs.append((x, y))
            ws.append(weight)
    m = len(frames)
    if m > max_observations:
        raise ValueError(f"{m} observations exceed capacity {max_observations}")
    pad = max_observations - m
    return BAProblem(
        obs_frame=jnp.asarray(np.asarray(frames + [0] * pad, np.int32)),
        obs_landmark=jnp.asarray(np.asarray(lms + [0] * pad, np.int32)),
        obs_uv=jnp.asarray(
            np.asarray(uvs + [(0.0, 0.0)] * pad, np.float32)
        ),
        obs_weight=jnp.asarray(np.asarray(ws + [0.0] * pad, np.float32)),
        num_frames=num_frames,
        num_landmarks=max(len(tracks), 1),
    )
