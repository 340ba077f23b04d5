"""Pipeline-parallel SuperGlue: GNN layers staged across a `pipe` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2 — its only
multi-device mechanism is `nn.DataParallel`). Here the 18-layer
attentional GNN (the bulk of SuperGlue compute) is cut into
`pipe`-many contiguous stages, each device holding `L/S` layers'
weights, and image-pair microbatches stream through a GPipe schedule:

  tick t: stage s runs microbatch (t - s) through its local layers,
          then `ppermute`s the activations to stage s+1.

TPU-first formulation: the schedule is one `lax.scan` over
`M + S - 1` ticks inside a single `shard_map` — no host round-trips,
the stage handoff is a neighbour `ppermute` that rides ICI, and the
per-stage layer loop is itself a `lax.scan` over stacked layer weights
(leading `L` axis sharded over `pipe`), so the compiled program is
O(1) in layer count. The kenc encoder before the GNN and the
Sinkhorn/extraction after it are pointwise-in-N or O(N²) once — they
run replicated outside the pipeline.

Weight layout: `stack_gnn_params` stacks the per-layer subtrees
(`params['gnn']['layer_{i}_{self|cross}']`) into one tree with a
leading layer axis plus an `is_cross` flag vector; the self/cross
source selection becomes a `jnp.where` on that flag so every stage
compiles to the same program.

Eval-mode (BN running stats), verified bit-close against the
single-device einsum model in tests/test_pipeline_parallel.py.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from image_matching_tpu.models.superglue import normalize_keypoints
from image_matching_tpu.ops.sinkhorn import (
    extract_matches_from_transport,
    log_optimal_transport,
)
from image_matching_tpu.parallel.context_parallel import _dense, _seq_mlp
from image_matching_tpu.structs import Keypoints

NEG_INF = -1e9


def stack_gnn_params(variables: dict, gnn_layers: int):
    """Stack per-layer GNN subtrees onto a leading layer axis.

    Returns (stacked_params, stacked_stats, is_cross) where every leaf
    of the stacked trees has shape (L, ...) and is_cross is a (L,) bool
    vector (True for cross-attention layers)."""
    names = [
        f"layer_{i}_{'self' if i % 2 == 0 else 'cross'}"
        for i in range(gnn_layers)
    ]
    layers_p = [variables["params"]["gnn"][n] for n in names]
    layers_s = [
        variables.get("batch_stats", {}).get("gnn", {}).get(n, {})
        for n in names
    ]
    stacked_p = jax.tree.map(lambda *xs: jnp.stack(xs), *layers_p)
    stacked_s = jax.tree.map(lambda *xs: jnp.stack(xs), *layers_s)
    is_cross = jnp.array([i % 2 == 1 for i in range(gnn_layers)])
    return stacked_p, stacked_s, is_cross


def _einsum_attention(p, x, src, src_mask, num_heads=4):
    """MultiHeadedAttention einsum path from raw param dicts (f32)."""
    d = x.shape[-1]
    d_head = d // num_heads
    b, n, _ = x.shape
    m = src.shape[1]
    q = _dense(p["proj_q"], x).reshape(b, n, num_heads, d_head)
    k = _dense(p["proj_k"], src).reshape(b, m, num_heads, d_head)
    v = _dense(p["proj_v"], src).reshape(b, m, num_heads, d_head)
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ) / (d_head**0.5)
    logits = jnp.where(src_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(b, n, d)
    return _dense(p["merge"], out)


def _stage_layers(local_p, local_s, local_cross, d0, d1, m0, m1):
    """Run this stage's layers (scan over the local layer axis)."""

    def step(carry, xs):
        d0, d1 = carry
        p_l, s_l, cross = xs
        src0 = jnp.where(cross, d1, d0)
        sm0 = jnp.where(cross, m1, m0)
        src1 = jnp.where(cross, d0, d1)
        sm1 = jnp.where(cross, m0, m1)
        a0 = _einsum_attention(p_l["attn"], d0, src0, sm0)
        a1 = _einsum_attention(p_l["attn"], d1, src1, sm1)
        d0 = d0 + _seq_mlp(
            p_l["mlp"], s_l["mlp"], jnp.concatenate([d0, a0], -1), m0
        )
        d1 = d1 + _seq_mlp(
            p_l["mlp"], s_l["mlp"], jnp.concatenate([d1, a1], -1), m1
        )
        return (d0, d1), None

    (d0, d1), _ = jax.lax.scan(step, (d0, d1), (local_p, local_s, local_cross))
    return d0, d1


def _gnn_pipeline_local(
    local_p, local_s, local_cross, in0, in1, masks0, masks1, axis_name
):
    """GPipe schedule over microbatches; runs per device inside shard_map.

    in0/in1: (M, mb, N, D) microbatched descriptors (replicated);
    masks0/1: (M, mb, N). Returns (M, mb, N, D) outputs (replicated via
    a masked psum from the last stage)."""
    s = jax.lax.axis_index(axis_name)
    n_stages = jax.lax.axis_size(axis_name)
    n_micro = in0.shape[0]
    fwd = [(i, i + 1) for i in range(n_stages - 1)]

    state0 = jnp.zeros_like(in0[0])
    state1 = jnp.zeros_like(in1[0])
    out0 = jnp.zeros_like(in0)
    out1 = jnp.zeros_like(in1)

    def tick(carry, t):
        state0, state1, out0, out1 = carry
        idx = t - s  # microbatch this stage processes at tick t
        idx_c = jnp.clip(idx, 0, n_micro - 1)
        x0 = jnp.where(s == 0, in0[idx_c], state0)
        x1 = jnp.where(s == 0, in1[idx_c], state1)
        m0 = masks0[idx_c]
        m1 = masks1[idx_c]
        y0, y1 = _stage_layers(local_p, local_s, local_cross, x0, x1, m0, m1)
        write = (idx >= 0) & (idx < n_micro) & (s == n_stages - 1)
        out0 = jax.lax.dynamic_update_index_in_dim(
            out0, jnp.where(write, y0, out0[idx_c]), idx_c, 0
        )
        out1 = jax.lax.dynamic_update_index_in_dim(
            out1, jnp.where(write, y1, out1[idx_c]), idx_c, 0
        )
        state0 = jax.lax.ppermute(y0, axis_name, fwd)
        state1 = jax.lax.ppermute(y1, axis_name, fwd)
        return (state0, state1, out0, out1), None

    ticks = jnp.arange(n_micro + n_stages - 1)
    (_, _, out0, out1), _ = jax.lax.scan(
        tick, (state0, state1, out0, out1), ticks
    )
    # only the last stage's buffers are real; replicate them
    keep = (s == n_stages - 1).astype(out0.dtype)
    out0 = jax.lax.psum(out0 * keep, axis_name)
    out1 = jax.lax.psum(out1 * keep, axis_name)
    return out0, out1


def make_pipelined_superglue(
    mesh: Mesh,
    gnn_layers: int = 18,
    sinkhorn_iterations: int = 30,
    match_threshold: float = 0.2,
    num_microbatches: int = 4,
    axis_name: str = "pipe",
):
    """Build `f(variables, kpts0, kpts1, shape0, shape1)` running the GNN
    pipeline-parallel over `axis_name`. Requires gnn_layers % pipe_size
    == 0 and batch % num_microbatches == 0. Eval mode; outputs match the
    single-device einsum model."""
    from jax.experimental.shard_map import shard_map

    n_stages = mesh.shape[axis_name]
    if gnn_layers % n_stages != 0:
        raise ValueError(
            f"gnn_layers={gnn_layers} not divisible by pipe={n_stages}"
        )

    def run(
        variables: dict,
        kpts0: Keypoints,
        kpts1: Keypoints,
        shape0: Tuple[int, int],
        shape1: Tuple[int, int],
    ) -> dict:
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        b, n, d = kpts0.desc.shape
        if b % num_microbatches != 0:
            raise ValueError(
                f"batch={b} not divisible by microbatches={num_microbatches}"
            )
        mb = b // num_microbatches

        # --- pre (replicated): keypoint encoder residual ---
        def encode(kp, shape):
            nrm = normalize_keypoints(kp.xy, *shape)
            enc = jnp.concatenate([nrm, kp.score[..., None]], axis=-1)
            return kp.desc.astype(jnp.float32) + _seq_mlp(
                params["kenc"], stats.get("kenc", {}), enc, kp.mask
            )

        desc0 = encode(kpts0, shape0)
        desc1 = encode(kpts1, shape1)

        stacked_p, stacked_s, is_cross = stack_gnn_params(
            variables, gnn_layers
        )
        micro = lambda x: x.reshape(num_microbatches, mb, *x.shape[1:])
        spec_l = lambda tree: jax.tree.map(lambda _: P(axis_name), tree)

        piped = shard_map(
            partial(_gnn_pipeline_local, axis_name=axis_name),
            mesh=mesh,
            in_specs=(
                spec_l(stacked_p), spec_l(stacked_s), P(axis_name),
                P(), P(), P(), P(),
            ),
            out_specs=(P(), P()),
            check_rep=False,
        )
        out0, out1 = piped(
            stacked_p, stacked_s, is_cross,
            micro(desc0), micro(desc1),
            micro(kpts0.mask), micro(kpts1.mask),
        )
        desc0 = out0.reshape(b, n, d)
        desc1 = out1.reshape(b, n, d)

        # --- post (replicated): projection, OT, extraction ---
        mdesc0 = _dense(params["final_proj"], desc0)
        mdesc1 = _dense(params["final_proj"], desc1)
        scores = jnp.einsum(
            "bnd,bmd->bnm", mdesc0, mdesc1,
            preferred_element_type=jnp.float32,
        ) / (d**0.5)
        z = log_optimal_transport(
            scores, params["bin_score"], sinkhorn_iterations,
            mask0=kpts0.mask, mask1=kpts1.mask,
        )
        matches0, matches1, mscores0, mscores1 = (
            extract_matches_from_transport(
                z, match_threshold, mask0=kpts0.mask, mask1=kpts1.mask
            )
        )
        return {
            "matches0": matches0,
            "matches1": matches1,
            "matching_scores0": mscores0,
            "matching_scores1": mscores1,
            "log_coupling": z,
        }

    return run
