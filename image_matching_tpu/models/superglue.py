"""SuperGlue attentional graph matcher (flax.linen, masked, TPU-first).

Architecture parity with superglue/models/superglue_test.py:49-285
(Sarlin et al., CVPR 2020): keypoint normalisation, MLP keypoint encoder
([3]+layers+[D]), L alternating self/cross attention layers with 4 heads,
final projection, score matrix /√D, dustbin Sinkhorn OT, mutual-max
extraction. TPU-first differences:

  * fixed-K masked keypoint sets — attention logits, BN statistics and
    the OT marginals are all mask-aware, so one compiled program serves
    every image pair;
  * attention is one fused einsum chain in bf16 (N≈1-2k keypoints fits
    VMEM easily); a Pallas blockwise kernel handles the long-context
    regime (ops/pallas/attention.py) and ring attention shards N across
    chips (parallel/ring_attention.py);
  * Sinkhorn runs as a `lax.scan` (ops/sinkhorn.py) instead of an
    unrolled Python loop.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from image_matching_tpu.models.common import DenseParams, SeqMLP
from image_matching_tpu.ops.sinkhorn import (
    extract_matches_from_transport,
    log_optimal_transport,
)
from image_matching_tpu.structs import Keypoints, MatchResult

NEG_INF = -1e9

# "auto" attention leaves the einsum path at/above this many keypoints
# (on TPU); above it, inference takes the one-pass Pallas kernel up to
# ONEPASS_MAX_KEYPOINTS and the blockwise flash kernel beyond (training
# goes straight to flash — see the dispatch comment in
# MultiHeadedAttention). Measured on v5e (scripts/bench_attention.py →
# artifacts/attention_bench.json, carry-dependent scan timing): at
# N=1024 einsum still wins IN-MODEL (fold-16 fusion), at N=2048 flash
# wins 2.8x standalone (0.138 vs 0.386 ms fwd at fold 8) and onepass
# edges out flash (0.127 vs 0.139), while einsum's f32 logits stop
# tiling entirely past 5k (84.6 ms at 6144). fwd+bwd crossover matches.
FLASH_MIN_KEYPOINTS = 2048


def normalize_keypoints(
    xy: jax.Array, height: int, width: int
) -> jax.Array:
    """Centre and scale keypoints by 0.7·max(H, W) — superglue_test.py:65-70."""
    size = jnp.array([width, height], dtype=xy.dtype)
    center = size / 2.0
    scaling = jnp.max(size) * 0.7
    return (xy - center) / scaling


class MultiHeadedAttention(nn.Module):
    """4-head attention over masked keypoint sets (superglue_test.py:85-106).

    `impl`: "einsum" materialises the (N, M) scores per head (fastest at
    the reference's N ≈ 1k, fully fused by XLA); "onepass" is the Pallas
    whole-K/V-resident single-pass kernel (mid sizes); "flash" is the
    Pallas blockwise online-softmax kernel (ops/pallas/attention.py)
    whose memory is O(N·d) — the long-context path for 10⁴⁺ keypoints;
    "auto" (the default everywhere) picks einsum below
    FLASH_MIN_KEYPOINTS, onepass up to ONEPASS_MAX_KEYPOINTS, flash
    beyond — shapes are static under jit, so the choice resolves at
    trace time.
    """

    num_heads: int
    dim: int
    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"
    # storage dtype of the (B, H, N, M) attention logits on the einsum
    # path. "bfloat16" halves the dominant HBM term of the SG stack at
    # the headline shape (the logits tensor is 36x the size of any
    # activation): the QK matmul still accumulates f32 on the MXU and
    # the softmax is computed in f32 from the bf16-rounded logits —
    # only the HBM round-trip narrows. f32 keeps the original numerics
    # bit-for-bit.
    logits_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (B, N, D)
        source: jax.Array,  # (B, M, D) — keys and values
        source_mask: Optional[jax.Array] = None,  # (B, M)
        return_premerge: bool = False,
        train: bool = False,
    ) -> jax.Array:
        d_head = self.dim // self.num_heads
        cd = self.dtype
        params = lambda name: DenseParams(self.dim, self.dim, name=name)()
        kq, bq = params("proj_q")
        kk, bk = params("proj_k")
        kv, bv = params("proj_v")
        # Fused projections: one matmul with the kernels concatenated
        # along the output dim instead of three (two when Q comes from a
        # different tensor, i.e. cross layers). Output columns are tiled
        # independently on the MXU with the same contraction order, so
        # results are bit-identical to separate Dense calls; what changes
        # is dispatch count and output-tile occupancy (256 -> 768 cols).
        if source is query:
            kernel = jnp.concatenate([kq, kk, kv], axis=1).astype(cd)
            bias = jnp.concatenate([bq, bk, bv]).astype(cd)
            qkv = query.astype(cd) @ kernel + bias
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = query.astype(cd) @ kq.astype(cd) + bq.astype(cd)
            kernel = jnp.concatenate([kk, kv], axis=1).astype(cd)
            bias = jnp.concatenate([bk, bv]).astype(cd)
            kv_ = source.astype(cd) @ kernel + bias
            k, v = jnp.split(kv_, 2, axis=-1)

        b, n, _ = q.shape
        m = k.shape[1]

        impl = self.impl
        if impl == "auto" and jax.default_backend() == "tpu":
            # v5e measurements (scripts/probe_attn_onepass.py, fold 8/16):
            # einsum wins below ~1k keys; the one-pass whole-K/V kernel
            # wins from 1024 up to its VMEM limit (0.063 vs 0.068 ms at
            # fold16/N1024; 0.127 vs flash 0.139 at N2048); the blocked
            # flash kernel takes over beyond ONEPASS_MAX_KEYPOINTS.
            # Isolated-kernel timings put the onepass crossover at 1024,
            # but IN-MODEL the 1024-2048 band stays on einsum
            # deliberately: the packed-heads call avoids fold transposes
            # yet still loses 0.23 ms to einsum's tighter fusion at
            # K=1024 (probe_sg, round 4: 5.41 vs 5.18 ms SG stack), so
            # FLASH_MIN_KEYPOINTS=2048 is the measured in-model boundary,
            # not a leftover.
            # Training never picks onepass: its custom_vjp backward
            # recomputes through the einsum reference and materialises
            # the full O(N·M) f32 logits — the forward's VMEM-friendly
            # behaviour would silently disappear under grad. Flash's
            # backward is blockwise, so training routes straight to it
            # above the einsum band (ADVICE round-4).
            from image_matching_tpu.ops.pallas.attention import (
                ONEPASS_MAX_KEYPOINTS,
            )

            if m >= FLASH_MIN_KEYPOINTS:
                if train or m > ONEPASS_MAX_KEYPOINTS:
                    impl = "flash"
                else:
                    impl = "onepass"
            else:
                impl = "einsum"
        elif impl == "auto":
            impl = "einsum"
        if impl == "onepass":
            # packed-head kernel: head split via lane-offset BlockSpecs,
            # no fold transposes (those cost more than the kernel saves
            # at N=1024, scripts/probe_sg.py round-4 measurement)
            from image_matching_tpu.ops.pallas.attention import (
                attention_onepass_heads,
            )

            out = attention_onepass_heads(
                q, k, v, source_mask, num_heads=self.num_heads
            )
            out = out.reshape(b, n, self.num_heads, d_head)
        elif impl == "flash":
            from image_matching_tpu.ops.pallas.attention import (
                flash_attention,
            )

            q = q.reshape(b, n, self.num_heads, d_head)
            k = k.reshape(b, m, self.num_heads, d_head)
            v = v.reshape(b, m, self.num_heads, d_head)
            fold = lambda x: x.transpose(0, 2, 1, 3).reshape(
                b * self.num_heads, -1, d_head
            )
            km = None
            if source_mask is not None:
                km = jnp.repeat(source_mask, self.num_heads, axis=0)
            out = flash_attention(fold(q), fold(k), fold(v), km)
            out = out.reshape(b, self.num_heads, n, d_head).transpose(0, 2, 1, 3)
        else:
            q = q.reshape(b, n, self.num_heads, d_head)
            k = k.reshape(b, m, self.num_heads, d_head)
            v = v.reshape(b, m, self.num_heads, d_head)
            if self.logits_dtype == "bfloat16":
                # Pre-scale Q (a (B, N, D)-sized op that fuses into the
                # projection epilogue) so the matmul can emit bf16
                # directly; softmax still runs in f32 — the convert
                # rides inside the softmax fusion, so HBM sees only
                # bf16 logits.
                qs = q * jnp.asarray(1.0 / (d_head ** 0.5), q.dtype)
                logits = jnp.einsum(
                    "bnhd,bmhd->bhnm", qs, k,
                    preferred_element_type=jnp.bfloat16,
                )
                if source_mask is not None:
                    logits = jnp.where(
                        source_mask[:, None, None, :], logits, NEG_INF
                    )
                probs = jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1
                ).astype(self.dtype)
            else:
                logits = jnp.einsum(
                    "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
                ) / (d_head ** 0.5)
                if source_mask is not None:
                    logits = jnp.where(
                        source_mask[:, None, None, :], logits, NEG_INF
                    )
                # NOTE (round-4 measurement): moving the softmax
                # normalisation after the PV matmul with a bf16 exp
                # tensor ((exp @ v) / s) measured 1.3 ms SLOWER in-model
                # — XLA splits the row-sum into its own full-tensor pass
                # and the divide forces a worse PV output layout
                # (scripts/profile_headline.py). The plain softmax fuses
                # logits+mask+softmax into one op; keep it.
                probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", probs, v)
        out = out.reshape(b, n, self.dim)
        km, bm = params("merge")
        if return_premerge:
            # caller folds the merge projection into its next matmul
            # (AttentionalPropagation -> SeqMLP Dense_0)
            return out, km, bm
        return out.astype(cd) @ km.astype(cd) + bm.astype(cd)


class AttentionalPropagation(nn.Module):
    """attn + MLP([2D, 2D, D]) residual message (superglue_test.py:109-117)."""

    dim: int
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    logits_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, source, x_mask, source_mask, train: bool = False):
        attn = MultiHeadedAttention(
            self.num_heads, self.dim, dtype=self.dtype,
            impl=self.attention_impl, logits_dtype=self.logits_dtype,
            name="attn"
        )
        mlp = SeqMLP((self.dim * 2, self.dim), dtype=self.dtype, name="mlp")
        # x2= splits the first Dense kernel instead of materialising
        # concat([x, message]) — identical params/outputs, saves
        # 8 MB/layer-side of HBM traffic at the headline shape.
        if not train:
            # Inference additionally folds the attention merge projection
            # into the message half of that kernel: msg @ Wm @ K2 becomes
            # msg @ (Wm K2) with the fold done once in f32 — one fewer
            # (B·N, D) x (D, D) matmul per layer-side, same params, equal
            # up to dtype rounding (reassociation).
            message, km, bm = attn(x, source, source_mask, return_premerge=True)
            return mlp(x, x_mask, train, x2=message, x2_fold=(km, bm))
        message = attn(x, source, source_mask, train=train)
        return mlp(x, x_mask, train, x2=message)


class AttentionalGNN(nn.Module):
    """Alternating self/cross attention stack (superglue_test.py:120-136).

    Each layer applies the same weights to both directions
    (superglue_test.py:134). `stack_sides` runs both directions as ONE
    2B-batched call per layer: the sides are concatenated along batch
    once at entry, cross-attention sources come from a batch roll
    (`jnp.roll(desc, B)` swaps the halves), and the split happens once
    at exit. A round-1 experiment that concatenated/sliced EVERY layer
    measured slower; the entry/exit-only layout keeps the copies to one
    roll per cross layer. Numerics are per-sample identical (tested).
    Off during training so BN batch statistics keep the two-call
    semantics the trainers were built on.
    """

    dim: int
    layer_names: Tuple[str, ...]
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"
    logits_dtype: str = "float32"
    stack_sides: bool = False

    @nn.compact
    def __call__(self, desc0, desc1, mask0, mask1, train: bool = False):
        if self.stack_sides and not train:
            b = desc0.shape[0]
            desc = jnp.concatenate([desc0, desc1], axis=0)  # (2B, N, D)
            mask = jnp.concatenate([mask0, mask1], axis=0)
            for i, name in enumerate(self.layer_names):
                layer = AttentionalPropagation(
                    self.dim, dtype=self.dtype,
                    attention_impl=self.attention_impl,
                    logits_dtype=self.logits_dtype,
                    name=f"layer_{i}_{name}"
                )
                if name == "cross":
                    src = jnp.roll(desc, b, axis=0)  # swap halves
                    sm = jnp.roll(mask, b, axis=0)
                else:
                    src, sm = desc, mask
                desc = desc + layer(desc, src, mask, sm, train)
            return desc[:b], desc[b:]
        for i, name in enumerate(self.layer_names):
            layer = AttentionalPropagation(
                self.dim, dtype=self.dtype,
                attention_impl=self.attention_impl,
                logits_dtype=self.logits_dtype, name=f"layer_{i}_{name}"
            )
            if name == "cross":
                src0, sm0 = desc1, mask1
                src1, sm1 = desc0, mask0
            else:
                src0, sm0 = desc0, mask0
                src1, sm1 = desc1, mask1
            delta0 = layer(desc0, src0, mask0, sm0, train)
            delta1 = layer(desc1, src1, mask1, sm1, train)
            desc0 = desc0 + delta0
            desc1 = desc1 + delta1
        return desc0, desc1


class SuperGlue(nn.Module):
    """Feature matching GNN with optimal-transport assignment.

    Defaults follow the reference's `default_config`
    (superglue_test.py:195-202); the self-trained pipeline uses
    descriptor_dim=128, keypoint_encoder [32, 64, 128], sinkhorn 30
    (superpoint_glue_test.py:30-35).
    """

    descriptor_dim: int = 256
    keypoint_encoder: Sequence[int] = (32, 64, 128, 256)
    gnn_layers: int = 18  # 9 × (self, cross)
    sinkhorn_iterations: int = 100
    match_threshold: float = 0.2
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"  # "auto" | "einsum" | "flash" | "onepass"
    # einsum-path logits storage dtype (see MultiHeadedAttention)
    logits_dtype: str = "float32"
    # "auto": fused Pallas iteration loop (ops/pallas/sinkhorn.py) at
    # inference on TPU, differentiable scan when training / elsewhere
    sinkhorn_impl: str = "auto"  # "auto" | "scan" | "pallas"
    # run both GNN directions as one 2B-batched call per layer (see
    # AttentionalGNN). Measured on v5e at B=4/K=1024 this LOSES: the
    # einsum attention's f32 logits traffic scales super-linearly past
    # batch 4 (the same cliff that makes batch-8 DP 1.5x slower per
    # pair) — 234 vs 336 pairs/s end-to-end. Kept as an option for
    # small-batch/large-K regimes where halving dispatches wins.
    stack_sides: bool = False

    def _layer_names(self):
        return tuple(
            "self" if i % 2 == 0 else "cross" for i in range(self.gnn_layers)
        )

    @nn.compact
    def __call__(
        self,
        kpts0: Keypoints,
        kpts1: Keypoints,
        image_shape0: Tuple[int, int],
        image_shape1: Tuple[int, int],
        train: bool = False,
    ) -> dict:
        d = self.descriptor_dim
        desc0 = kpts0.desc.astype(self.dtype)
        desc1 = kpts1.desc.astype(self.dtype)
        mask0, mask1 = kpts0.mask, kpts1.mask

        n0 = normalize_keypoints(kpts0.xy, *image_shape0)
        n1 = normalize_keypoints(kpts1.xy, *image_shape1)

        kenc = SeqMLP(
            tuple(self.keypoint_encoder) + (d,), dtype=self.dtype, name="kenc"
        )
        enc_in0 = jnp.concatenate([n0, kpts0.score[..., None]], axis=-1)
        enc_in1 = jnp.concatenate([n1, kpts1.score[..., None]], axis=-1)
        desc0 = desc0 + kenc(enc_in0.astype(self.dtype), mask0, train)
        desc1 = desc1 + kenc(enc_in1.astype(self.dtype), mask1, train)

        desc0, desc1 = AttentionalGNN(
            d, self._layer_names(), dtype=self.dtype,
            attention_impl=self.attention_impl,
            logits_dtype=self.logits_dtype,
            stack_sides=self.stack_sides, name="gnn"
        )(desc0, desc1, mask0, mask1, train)

        final = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name="final_proj")
        mdesc0, mdesc1 = final(desc0), final(desc1)

        scores = jnp.einsum(
            "bnd,bmd->bnm", mdesc0, mdesc1, preferred_element_type=jnp.float32
        ) / (d ** 0.5)

        bin_score = self.param(
            "bin_score", nn.initializers.constant(1.0), (), jnp.float32
        )
        sk_impl = self.sinkhorn_impl
        if sk_impl == "auto":
            # the fused kernel keeps the whole (M+1, N+1) f32 coupling
            # VMEM-resident (ops/pallas/sinkhorn.py) — only profitable
            # and only *possible* while it fits; long-context keypoint
            # counts fall back to the scan
            m_pad, n_pad = scores.shape[-2] + 1, scores.shape[-1] + 1
            fits_vmem = m_pad * n_pad * 4 <= 8 * 1024 * 1024
            sk_impl = (
                "pallas"
                if not train and jax.default_backend() == "tpu" and fits_vmem
                else "scan"
            )
        z = log_optimal_transport(
            scores, bin_score, self.sinkhorn_iterations,
            mask0=mask0, mask1=mask1, impl=sk_impl,
        )
        matches0, matches1, mscores0, mscores1 = extract_matches_from_transport(
            z, self.match_threshold, mask0=mask0, mask1=mask1
        )
        return {
            "matches0": matches0,
            "matches1": matches1,
            "matching_scores0": mscores0,
            "matching_scores1": mscores1,
            "log_coupling": z,
        }


def match_result_from_outputs(outputs: dict) -> MatchResult:
    return MatchResult(
        matches0=outputs["matches0"],
        matches1=outputs["matches1"],
        scores0=outputs["matching_scores0"],
        scores1=outputs["matching_scores1"],
    )
