"""Distributed pose-graph optimization over 2D similarities.

The north-star back-end from BASELINE.json: the reference registers each
source frame to the template independently (`PointTracker`,
model_wrap.py:355-544, is its only multi-frame structure); here pairwise
registrations become a *pose graph* that is solved globally.

Formulation. Each frame i carries a similarity S_i (4 params
z_i = (a, b, tx, ty), matrix [[a, -b, tx], [b, a, ty]]) mapping frame-i
pixel coords into a common world frame. A registration edge (i → j)
measures T_ij (frame i → frame j), giving the consistency constraint
S_i = S_j ∘ T_ij. Because 2D similarities compose *linearly* in this
parameterisation (rotation+scale is complex multiplication), the
residual r_e = z_i − L(T_ij) z_j is linear and global optimisation is a
sparse weighted least-squares problem — solved here with conjugate
gradients on the normal equations, where one matvec is two
gather/scatter-adds over the edge list. Gauge freedom is fixed by
anchoring frame 0 with a strong prior.

Distribution: frames shard over a mesh axis; each device owns its
frames' rows of the normal matrix and the CG matvec reduces partial
edge contributions with `psum` — the Schur/collective pattern called
for in BASELINE.json's north star, with every step a dense fixed-shape
kernel. Verified sharded == unsharded in tests.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P


@struct.dataclass
class PoseGraph:
    """Edge list (fixed capacity, masked).

    src, dst: (E,) int32 frame indices; rel: (E, 4) params of T_ij
    (frame src → frame dst); weight: (E,) float (0 = padding)."""

    src: jax.Array
    dst: jax.Array
    rel: jax.Array
    weight: jax.Array
    num_frames: int = struct.field(pytree_node=False, default=0)


def similarity_params_to_matrix(z: jax.Array) -> jax.Array:
    """(..., 4) (a, b, tx, ty) → (..., 2, 3)."""
    a, b, tx, ty = z[..., 0], z[..., 1], z[..., 2], z[..., 3]
    row0 = jnp.stack([a, -b, tx], axis=-1)
    row1 = jnp.stack([b, a, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def matrix_to_similarity_params(m: jax.Array) -> jax.Array:
    """(..., 2, 3) → (..., 4); assumes a proper similarity matrix."""
    return jnp.stack(
        [m[..., 0, 0], m[..., 1, 0], m[..., 0, 2], m[..., 1, 2]], axis=-1
    )


def compose_similarity(z2: jax.Array, z1: jax.Array) -> jax.Array:
    """Params of S2 ∘ S1 (apply S1 first): rotation/scale multiply as
    complex numbers, translation t = R2 t1 + t2."""
    a2, b2, t2x, t2y = z2[..., 0], z2[..., 1], z2[..., 2], z2[..., 3]
    a1, b1, t1x, t1y = z1[..., 0], z1[..., 1], z1[..., 2], z1[..., 3]
    a = a2 * a1 - b2 * b1
    b = a2 * b1 + b2 * a1
    tx = a2 * t1x - b2 * t1y + t2x
    ty = b2 * t1x + a2 * t1y + t2y
    return jnp.stack([a, b, tx, ty], axis=-1)


def _edge_operator(rel: jax.Array) -> jax.Array:
    """(E, 4, 4) linear map L with (S_j ∘ T_ij) params = L(T_ij) @ z_j."""
    a1, b1, t1x, t1y = rel[..., 0], rel[..., 1], rel[..., 2], rel[..., 3]
    z = jnp.zeros_like(a1)
    o = jnp.ones_like(a1)
    # rows express (a, b, tx, ty) of the composition in terms of z_j
    row_a = jnp.stack([a1, -b1, z, z], -1)
    row_b = jnp.stack([b1, a1, z, z], -1)
    row_tx = jnp.stack([t1x, -t1y, o, z], -1)
    row_ty = jnp.stack([t1y, t1x, z, o], -1)
    return jnp.stack([row_a, row_b, row_tx, row_ty], -2)


def _residuals(z: jax.Array, graph: PoseGraph) -> jax.Array:
    """(E, 4): z_src − L(rel) z_dst, masked by weight."""
    l_op = _edge_operator(graph.rel)
    zi = z[graph.src]
    zj = z[graph.dst]
    pred = jnp.einsum("eij,ej->ei", l_op, zj)
    return (zi - pred) * graph.weight[:, None]


def _normal_matvec(z, graph: PoseGraph, anchor_weight: float):
    """A^T W A @ z for the stacked edge system + anchor prior on frame 0."""
    l_op = _edge_operator(graph.rel)
    w = graph.weight[:, None]
    r = (z[graph.src] - jnp.einsum("eij,ej->ei", l_op, z[graph.dst])) * w
    out = jnp.zeros_like(z)
    out = out.at[graph.src].add(r * w)
    back = jnp.einsum("eji,ej->ei", l_op, r * w)
    out = out.at[graph.dst].add(-back)
    out = out.at[0].add(anchor_weight * z[0])
    return out


def _normal_rhs(graph: PoseGraph, anchor: jax.Array, anchor_weight: float):
    n = graph.num_frames
    rhs = jnp.zeros((n, 4))
    rhs = rhs.at[0].add(anchor_weight * anchor)
    return rhs


def _jacobi_diag(graph: PoseGraph, num_frames: int, anchor_weight: float):
    """diag(AᵀW²A): w² at source blocks, w²·colnorm(L)² at dest blocks."""
    l_op = _edge_operator(graph.rel)
    w2 = (graph.weight ** 2)[:, None]
    diag = jnp.zeros((num_frames, 4))
    diag = diag.at[graph.src].add(w2 * jnp.ones((1, 4)))
    colnorm = jnp.sum(l_op ** 2, axis=1)  # (E, 4)
    diag = diag.at[graph.dst].add(w2 * colnorm)
    diag = diag.at[0].add(anchor_weight)
    return jnp.maximum(diag, 1e-8)


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    graph: PoseGraph,
    init: Optional[jax.Array] = None,
    iters: int = 100,
    anchor_weight: float = 10.0,
) -> jax.Array:
    """Solve for (N, 4) similarity params via CG on the normal equations.

    Frame 0 is anchored to the identity (or to `init[0]`). The system is
    linear, so this is exact global optimisation — no initial-guess
    sensitivity (init only seeds CG)."""
    n = graph.num_frames
    identity = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1))
    z0 = init if init is not None else identity
    anchor = z0[0]

    matvec = lambda v: _normal_matvec(v, graph, anchor_weight)
    rhs = _normal_rhs(graph, anchor, anchor_weight)
    diag = _jacobi_diag(graph, n, anchor_weight)

    sol, _ = jax.scipy.sparse.linalg.cg(
        matvec, rhs, x0=z0, maxiter=iters, tol=1e-10, M=lambda v: v / diag
    )
    return sol


def make_sharded_pose_graph_solver(
    mesh: Mesh, num_frames: int, iters: int = 100,
    axis_name: str = "data", anchor_weight: float = 10.0,
):
    """Frame-sharded CG solver: each device owns N/P frames and the
    edges whose *source* lives on it; the matvec's scatter contributions
    to remote frames reduce with psum.

    Inputs to the returned fn: graph edge arrays sharded over the edge
    axis, a replicated init. Output: replicated (N, 4) solution.
    """
    from jax.experimental.shard_map import shard_map

    n_dev = mesh.shape[axis_name]
    assert num_frames % 1 == 0

    def local_matvec(v, src, dst, rel, weight):
        """v replicated (N, 4); edges local; returns full-size partial."""
        l_op = _edge_operator(rel)
        w = weight[:, None]
        r = (v[src] - jnp.einsum("eij,ej->ei", l_op, v[dst])) * w
        out = jnp.zeros_like(v)
        out = out.at[src].add(r * w)
        back = jnp.einsum("eji,ej->ei", l_op, r * w)
        out = out.at[dst].add(-back)
        return out

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(axis_name), P(axis_name), P(axis_name, None), P(axis_name),
            P(None, None),
        ),
        out_specs=P(None, None),
        check_rep=False,
    )
    def solve(src, dst, rel, weight, z0):
        anchor = z0[0]

        def matvec(v):
            partial_ = local_matvec(v, src, dst, rel, weight)
            total = jax.lax.psum(partial_, axis_name)
            return total.at[0].add(anchor_weight * v[0])

        rhs = jnp.zeros((num_frames, 4)).at[0].add(anchor_weight * anchor)
        # Jacobi preconditioner from the local edges, reduced over the mesh
        l_op = _edge_operator(rel)
        w2 = (weight ** 2)[:, None]
        diag_local = jnp.zeros((num_frames, 4))
        diag_local = diag_local.at[src].add(w2 * jnp.ones((1, 4)))
        diag_local = diag_local.at[dst].add(w2 * jnp.sum(l_op ** 2, axis=1))
        diag = jax.lax.psum(diag_local, axis_name).at[0].add(anchor_weight)
        diag = jnp.maximum(diag, 1e-8)
        sol, _ = jax.scipy.sparse.linalg.cg(
            matvec, rhs, x0=z0, maxiter=iters, tol=1e-10, M=lambda v: v / diag
        )
        return sol

    return solve


def absolute_trajectory_error(
    est: jax.Array, gt: jax.Array, align: bool = True
) -> jax.Array:
    """ATE over frame translations: mean ||t_est − t_gt|| after optional
    similarity alignment of the estimated trajectory to GT."""
    te = est[:, 2:4]
    tg = gt[:, 2:4]
    if align:
        from image_matching_tpu.ops.ransac import fit_similarity_lsq

        mat = fit_similarity_lsq(te, tg, jnp.ones(te.shape[0]))
        te = te @ mat[:, :2].T + mat[:, 2]
    return jnp.mean(jnp.linalg.norm(te - tg, axis=-1))
