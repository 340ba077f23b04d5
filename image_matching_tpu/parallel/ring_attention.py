"""Ring attention: sequence-parallel attention over a `context` mesh axis.

The reference caps SuperGlue at max_keypoints≈1200 because its attention
is a dense N×M einsum on one GPU (superglue_test.py:85-89; SURVEY.md §5
calls this the repo's missing long-context story). Here the keypoint
axis is sharded over mesh devices: each device holds N/P queries and
N/P keys/values; K/V blocks rotate around the ring with
`jax.lax.ppermute` while each device folds the incoming block into an
online-softmax accumulator — the classic ring-attention schedule, with
key-validity masks riding along. Communication (ICI neighbour exchange)
overlaps with the block attention compute under XLA's scheduler.

Works on any mesh axis; exact (not approximate) — verified against the
single-device oracle in tests.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e9


def _block_update(q, k, v, key_mask, scale, m_prev, l_prev, acc):
    """Fold one K/V block into the online-softmax state.

    q: (B, Nq, D); k, v: (B, Nk, D); key_mask: (B, Nk);
    m_prev, l_prev: (B, Nq, 1); acc: (B, Nq, D) f32."""
    s = jnp.einsum(
        "bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(key_mask[:, None, :], s, NEG_INF)

    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.einsum(
        "bnm,bmd->bnd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return m_next, l_next, acc


def ring_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array,
    axis_name: str,
    scale: Optional[float] = None,
):
    """Per-shard body (call inside shard_map over `axis_name`).

    q/k/v: (B, N_local, D) local shards; key_mask: (B, N_local)."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    p_size = jax.lax.axis_size(axis_name)

    b, nq, _ = q.shape
    m0 = jnp.full((b, nq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, nq, 1), jnp.float32)
    acc0 = jnp.zeros((b, nq, d), jnp.float32)

    def body(carry, _):
        k_blk, v_blk, mask_blk, m, l, acc = carry
        m, l, acc = _block_update(q, k_blk, v_blk, mask_blk, scale, m, l, acc)
        # rotate K/V/mask to the next device on the ring
        perm = [(i, (i + 1) % p_size) for i in range(p_size)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        return (k_blk, v_blk, mask_blk, m, l, acc), None

    (k_f, v_f, mask_f, m, l, acc), _ = jax.lax.scan(
        body, (k, v, key_mask, m0, l0, acc0), None, length=p_size
    )
    del k_f, v_f, mask_f
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    return (acc * l_inv).astype(q.dtype)


def make_ring_attention(mesh: Mesh, axis_name: str = "context"):
    """Build `attn(q, k, v, key_mask)` over globally-shaped arrays
    (B, N, D)/(B, N): shards the N axis over `axis_name`, runs the ring
    schedule, returns the globally-shaped output."""
    from jax.experimental.shard_map import shard_map

    spec3 = P(None, axis_name, None)
    spec2 = P(None, axis_name)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec3, spec3, spec3, spec2),
        out_specs=spec3,
        check_rep=False,
    )
    def attn(q, k, v, key_mask):
        return ring_attention_local(q, k, v, key_mask, axis_name)

    return attn
