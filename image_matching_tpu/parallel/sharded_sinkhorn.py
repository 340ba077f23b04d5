"""Mesh-sharded log-domain Sinkhorn: the coupling's row axis lives on a
`context` mesh axis; each iteration's column logsumexp becomes a
pmax + psum pair over ICI.

SURVEY.md §5 flags this as a first-class deliverable: the reference's
Sinkhorn (superglue_test.py:139-156) holds the full (M+1)×(N+1)
coupling on one GPU. Here each device owns M/P rows (queries stay with
their GNN shard from ring attention), so keypoint counts scale with the
mesh. 30–100 iterations ⇒ 2 collectives each; both reduce over the row
axis only (u updates stay local).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

BIG_NEG = -1e9


def _lse_rows_sharded(t: jax.Array, axis_name: str) -> jax.Array:
    """logsumexp over the (sharded) row axis of t: (M_local, N) → (N,)."""
    mx_local = jnp.max(t, axis=0)
    mx = jax.lax.pmax(mx_local, axis_name)
    s = jax.lax.psum(jnp.sum(jnp.exp(t - mx[None, :]), axis=0), axis_name)
    return mx + jnp.log(jnp.maximum(s, 1e-38))


def sharded_log_sinkhorn_local(
    z_local: jax.Array,  # (M_local, N) rows of the coupling on this shard
    log_mu_local: jax.Array,  # (M_local,)
    log_nu: jax.Array,  # (N,) replicated
    iters: int,
    axis_name: str,
) -> jax.Array:
    """Per-shard body (call inside shard_map): returns this shard's rows
    of Z + u ⊕ v. Row (u) updates are local; column (v) updates reduce
    over the mesh axis."""
    z_local = z_local.astype(jnp.float32)

    def step(carry, _):
        u, v = carry
        u = log_mu_local - jax.nn.logsumexp(z_local + v[None, :], axis=1)
        v = log_nu - _lse_rows_sharded(z_local + u[:, None], axis_name)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu_local, dtype=jnp.float32)
    v0 = jnp.zeros_like(log_nu, dtype=jnp.float32)
    (u, v), _ = jax.lax.scan(step, (u0, v0), None, length=iters)
    return z_local + u[:, None] + v[None, :]


def make_sharded_log_optimal_transport(
    mesh: Mesh, iters: int, axis_name: str = "context"
):
    """Build `ot(couplings, log_mu, log_nu) -> z` over globally-shaped
    arrays: couplings (M, N) with rows sharded over `axis_name`,
    log_mu (M,) sharded alike, log_nu (N,) replicated.

    Dustbin construction and the m+n rescale are the caller's job (use
    ops/sinkhorn.log_optimal_transport's recipe) — this is the inner
    normalisation loop, which is where the sharding matters.
    """
    from jax.experimental.shard_map import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P(None)),
        out_specs=P(axis_name, None),
        check_rep=False,
    )
    def ot(z, log_mu, log_nu):
        return sharded_log_sinkhorn_local(z, log_mu, log_nu, iters, axis_name)

    return ot
