"""Masked flash attention as a Pallas TPU kernel.

The SuperGlue GNN runs 18 layers × 2 directions of full dense attention
(superglue/models/superglue_test.py:85-89 — an N×M einsum per layer).
At the reference's N ≈ 1200 XLA handles this fine, but the scores matrix
is O(N²) per head and becomes the long-context bottleneck at 10⁴⁺
keypoints (SURVEY.md §5). This kernel tiles Q and K/V with an online
softmax so the scores tile never leaves VMEM, with key-validity masking
(fixed-K padded sets) built in.

Forward and backward are both Pallas kernels wired through custom_vjp
(defvjp below): the forward emits per-row log-sum-exp, and the backward
runs two blockwise passes (dK/dV accumulated over Q blocks, dQ over KV
blocks) recomputing the probability tiles from the saved LSE — standard
flash-attention-2 structure, O(N·d) memory end to end.

Layout: q (B, Nq, D), k/v (B, Nkv, D), key_mask (B, Nkv) bool.
B folds batch×heads. Masked logits get -1e9, matching
models/superglue.py's einsum path bit-for-bit semantics.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LANES = 128


def attention_reference(q, k, v, key_mask=None, scale=None):
    """XLA einsum attention with the same masking semantics (oracle +
    backward path). q: (B, Nq, D); k, v: (B, Nk, D); key_mask: (B, Nk)."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum(
        "bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bnm,bmd->bnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, num_kv_blocks: int,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]
    mask = mask_ref[0, 0]  # (block_k,) int32

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_k)
    s = jnp.where(mask[None, :] > 0, s, NEG_INF)

    m_prev = m_scratch[...]  # (block_q, LANES)
    l_prev = l_scratch[...]

    m_curr = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # broadcast over lanes
    alpha = jnp.exp(m_prev - m_next)  # (block_q, LANES)
    p = jnp.exp(s - m_next[:, :1])  # (block_q, block_k)
    l_corr = alpha * l_prev
    l_next = l_corr + jnp.sum(p, axis=1, keepdims=True)

    m_scratch[...] = m_next
    l_scratch[...] = l_next

    acc_scratch[...] = acc_scratch[...] * alpha[:, :1]
    acc_scratch[...] += jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l_final = l_scratch[...][:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _flash_kernel_with_lse(
    q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, num_kv_blocks: int,
):
    """Forward that also emits the log-sum-exp rows for the backward."""
    _flash_kernel(
        q_ref, k_ref, v_ref, mask_ref, o_ref,
        m_scratch, l_scratch, acc_scratch,
        scale=scale, num_kv_blocks=num_kv_blocks,
    )
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store_lse():
        m_final = m_scratch[...][:, :1]
        l_final = l_scratch[...][:, :1]
        lse = m_final + jnp.log(jnp.maximum(l_final, 1e-38))
        lse_ref[0, 0] = lse[:, 0]


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, scale: float, num_q_blocks: int,
):
    """Accumulate dK/dV for one KV block over all Q blocks (innermost)."""
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, jnp.float32)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, jnp.float32)

    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]
    mask = mask_ref[0, 0]  # (block_k,)
    do = do_ref[0].astype(jnp.float32)  # (block_q, d)
    lse = lse_ref[0, 0][:, None]  # (block_q, 1)
    delta = delta_ref[0, 0][:, None]  # (block_q, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask[None, :] > 0, s, NEG_INF)
    p = jnp.exp(s - lse)  # (block_q, block_k)

    dv_scratch[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # pᵀ dO
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, block_k)
    ds = p * (dp - delta) * scale
    dk_scratch[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # dsᵀ q

    @pl.when(q_idx == num_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_scratch,
    *, scale: float, num_kv_blocks: int,
):
    """Accumulate dQ for one Q block over all KV blocks (innermost)."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[...] = jnp.zeros(dq_scratch.shape, jnp.float32)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0, 0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask[None, :] > 0, s, NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * scale
    dq_scratch[...] += jax.lax.dot(
        ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        dq_ref[0] = dq_scratch[...].astype(dq_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6)
)
def _flash_attention_blocked(q, k, v, key_mask, scale, block_q, block_k):
    return _flash_forward(q, k, v, key_mask, scale, block_q, block_k)


def _auto_blocks(nq: int, nk: int) -> tuple:
    """Block sizes when the caller doesn't pick: as large as VMEM allows.

    The v5e measurement that set these: at N=1024 the original 128x128
    blocks put a 3-level loop (8 q-blocks x 8 kv-blocks per batch cell)
    around tiny (128, 64)x(64, 128) matmuls and ran 2.3x SLOWER than
    the einsum path; one kv block (block_k = N) removes the online-
    softmax rescale loop entirely and turns each grid cell into two
    well-shaped matmuls over a VMEM-resident (block_q, nk) tile.
    block_q x block_k f32 scores + q/k/v/o tiles stay well under the
    ~16 MB VMEM budget (512x1024x4 B = 2 MB)."""
    r128 = lambda n: -(-n // 128) * 128
    return min(512, r128(nq)), min(1024, r128(nk))


def _attn_onepass_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    """Whole-K/V-resident attention: no online-softmax state, no
    scratch round-trips — logits computed once, exp'd once, contracted
    once. The XLA einsum path at these sizes recomputes the logits for
    the A·V pass (profiler: the softmax-stats fusion dominates)."""
    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (nk, d)
    v = v_ref[0]
    mask = mask_ref[0, 0]  # (nk,)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask[None, :] > 0, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _onepass_forward(q, k, v, key_mask, scale, block_q):
    b, nq, d = q.shape
    nk = k.shape[1]
    scale_val = scale if scale is not None else 1.0 / math.sqrt(d)
    nq_pad = -(-nq // block_q) * block_q
    nk_pad = -(-nk // LANES) * LANES
    qp = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, 0)))
    if key_mask is None:
        key_mask = jnp.ones((b, nk), bool)
    mp = jnp.pad(key_mask.astype(jnp.int32), ((0, 0), (0, nk_pad - nk)))
    mp = mp[:, None, :]
    out = pl.pallas_call(
        functools.partial(_attn_onepass_kernel, scale=scale_val),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, d), q.dtype),
        grid=(b, nq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, nk_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, 1, nk_pad), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b_, i: (b_, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp, mp)
    return out[:, :nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_onepass(q, k, v, key_mask, scale, block_q):
    return _onepass_forward(q, k, v, key_mask, scale, block_q)


def _onepass_fwd(q, k, v, key_mask, scale, block_q):
    return _onepass_forward(q, k, v, key_mask, scale, block_q), (
        q, k, v, key_mask,
    )


def _onepass_bwd(scale, block_q, res, g):
    q, k, v, key_mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_reference(q_, k_, v_, key_mask, scale),
        q, k, v,
    )
    return (*vjp(g), None)


_attention_onepass.defvjp(_onepass_fwd, _onepass_bwd)

# one-pass applicability: the (block_q, nk) f32 logits tile plus K/V
# must sit in VMEM — nk*4*block_q + 2*nk*d*2 well under ~16 MB
ONEPASS_MAX_KEYPOINTS = 4096


def attention_reference_heads(q, k, v, key_mask=None, num_heads=4,
                              scale=None):
    """Multi-head einsum attention on packed (B, N, H*Dh) tensors —
    oracle and backward path for `attention_onepass_heads`; matches
    models/superglue.py's einsum formulation."""
    b, n, dt = q.shape
    m = k.shape[1]
    dh = dt // num_heads
    scale = scale if scale is not None else 1.0 / math.sqrt(dh)
    qh = q.reshape(b, n, num_heads, dh)
    kh = k.reshape(b, m, num_heads, dh)
    vh = v.reshape(b, m, num_heads, dh)
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", probs, vh, preferred_element_type=jnp.float32
    )
    return out.reshape(b, n, dt).astype(q.dtype)


def _attn_onepass_pair_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                              scale, dh, g):
    """One-pass attention over g = 128/d_head heads packed in one
    lane-aligned block.

    Pallas block shapes must tile (8, 128), so a d_head-lane per-head
    block is illegal for d_head < 128; instead each block carries g
    consecutive heads and they are separated by lane MASKS: zeroing the
    other heads' lanes before the full-width QK^T contraction yields
    each head's logits exactly (the cross terms multiply by zero), and
    the MXU pays nothing extra — a k=d_head contraction would occupy
    the same padded 128-lane pass."""
    q = q_ref[0]  # (block_q, g*dh)
    k = k_ref[0]  # (nk, g*dh)
    v = v_ref[0]
    mask = mask_ref[0, 0]  # (nk,)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, g * dh), 1)
    out = jnp.zeros((q.shape[0], g * dh), jnp.float32)
    for h in range(g):
        sel = (lane >= h * dh) & (lane < (h + 1) * dh)
        qm = jnp.where(sel, q, 0).astype(q.dtype)
        s = jax.lax.dot_general(
            qm, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(mask[None, :] > 0, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ) / l
        out = jnp.where(sel, o, out)
    o_ref[0] = out.astype(o_ref.dtype)


def _onepass_heads_forward(q, k, v, key_mask, num_heads, scale, block_q):
    b, nq, dt = q.shape
    nk = k.shape[1]
    dh = dt // num_heads
    g = LANES // dh  # heads per 128-lane block
    if dh > LANES or LANES % dh or num_heads % g:
        raise ValueError(
            f"packed-head kernel needs d_head dividing {LANES} and the "
            f"head count a multiple of {LANES}//d_head, got "
            f"H={num_heads} dh={dh}"
        )
    scale_val = scale if scale is not None else 1.0 / math.sqrt(dh)
    nq_pad = -(-nq // block_q) * block_q
    nk_pad = -(-nk // LANES) * LANES
    qp = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, 0)))
    if key_mask is None:
        key_mask = jnp.ones((b, nk), bool)
    mp = jnp.pad(key_mask.astype(jnp.int32), ((0, 0), (0, nk_pad - nk)))
    mp = mp[:, None, :]
    out = pl.pallas_call(
        functools.partial(
            _attn_onepass_pair_kernel, scale=scale_val, dh=dh, g=g
        ),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, dt), q.dtype),
        grid=(b, num_heads // g, nq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, g * dh), lambda b_, h, i: (b_, i, h)),
            pl.BlockSpec((1, nk_pad, g * dh), lambda b_, h, i: (b_, 0, h)),
            pl.BlockSpec((1, nk_pad, g * dh), lambda b_, h, i: (b_, 0, h)),
            pl.BlockSpec((1, 1, nk_pad), lambda b_, h, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, g * dh), lambda b_, h, i: (b_, i, h)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp, mp)
    return out[:, :nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_onepass_heads(q, k, v, key_mask, num_heads, scale, block_q):
    return _onepass_heads_forward(q, k, v, key_mask, num_heads, scale,
                                  block_q)


def _onepass_heads_fwd(q, k, v, key_mask, num_heads, scale, block_q):
    return (
        _onepass_heads_forward(q, k, v, key_mask, num_heads, scale, block_q),
        (q, k, v, key_mask),
    )


def _onepass_heads_bwd(num_heads, scale, block_q, res, g):
    q, k, v, key_mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_reference_heads(
            q_, k_, v_, key_mask, num_heads, scale
        ),
        q, k, v,
    )
    return (*vjp(g), None)


_attention_onepass_heads.defvjp(_onepass_heads_fwd, _onepass_heads_bwd)


def attention_onepass_heads(q, k, v, key_mask, num_heads=4, scale=None,
                            block_q=None):
    """Single-pass multi-head attention on PACKED (B, N, H*Dh) tensors:
    the head split happens in the grid/BlockSpec (lane-aligned head
    groups) + in-kernel lane masks, so no fold transposes ever
    materialise — the overhead that makes the folded one-pass kernel
    lose to einsum in-model at N=1024. Falls back to the folded kernel
    when the head geometry doesn't pack into 128-lane groups.
    Differentiable (backward recomputes via the einsum reference)."""
    if block_q is None:
        r128 = lambda n: -(-n // 128) * 128
        block_q = min(512, r128(q.shape[1]))
    b, n, dt = q.shape
    dh = dt // num_heads
    if dh <= LANES and LANES % dh == 0 and num_heads % (LANES // dh) == 0:
        return _attention_onepass_heads(
            q, k, v, key_mask, num_heads, scale, block_q
        )
    # fold to (B*H, N, dh) and use the single-head kernel
    m = k.shape[1]
    fold = lambda x: x.reshape(b, -1, num_heads, dh).transpose(
        0, 2, 1, 3).reshape(b * num_heads, -1, dh)
    km = None if key_mask is None else jnp.repeat(key_mask, num_heads, 0)
    out = _attention_onepass(
        fold(q), fold(k), fold(v), km, scale, block_q
    )
    return out.reshape(b, num_heads, n, dh).transpose(0, 2, 1, 3).reshape(
        b, n, dt
    )


def attention_onepass(q, k, v, key_mask, scale=None, block_q=None):
    """Single-pass whole-context attention (inference sweet spot for
    N <= ONEPASS_MAX_KEYPOINTS). Differentiable: backward recomputes
    through the einsum reference VJP."""
    if block_q is None:
        r128 = lambda n: -(-n // 128) * 128
        block_q = min(512, r128(q.shape[1]))
    return _attention_onepass(q, k, v, key_mask, scale, block_q)


def flash_attention(
    q, k, v, key_mask, scale=None,
    block_q: int | None = None, block_k: int | None = None,
):
    """Masked flash attention. q (B, Nq, D), k/v (B, Nk, D),
    key_mask (B, Nk) bool. Nq/Nk padded to block multiples internally;
    block sizes default to the VMEM-filling heuristic (_auto_blocks)."""
    bq, bk = _auto_blocks(q.shape[1], k.shape[1])
    return _flash_attention_blocked(
        q, k, v, key_mask, scale,
        block_q if block_q is not None else bq,
        block_k if block_k is not None else bk,
    )


def _flash_forward(q, k, v, key_mask, scale, block_q, block_k):
    b, nq, d = q.shape
    nk = k.shape[1]
    scale_val = scale if scale is not None else 1.0 / math.sqrt(d)

    nq_pad = -(-nq // block_q) * block_q
    nk_pad = -(-nk // block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, 0)))
    if key_mask is None:
        key_mask = jnp.ones((b, nk), bool)
    mp = jnp.pad(key_mask.astype(jnp.int32), ((0, 0), (0, nk_pad - nk)))
    mp = mp[:, None, :]  # (B, 1, Nk): keeps the trailing block dims tileable

    num_kv_blocks = nk_pad // block_k
    grid = (b, nq_pad // block_q, num_kv_blocks)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale_val, num_kv_blocks=num_kv_blocks
        ),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b_, i, j: (b_, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        # run interpreted off-TPU so the CPU test mesh exercises the kernel
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp, mp)
    return out[:, :nq]


def _pad_inputs(q, k, v, key_mask, block_q, block_k):
    b, nq, d = q.shape
    nk = k.shape[1]
    nq_pad = -(-nq // block_q) * block_q
    nk_pad = -(-nk // block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, nq_pad - nq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, nk_pad - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, nk_pad - nk), (0, 0)))
    if key_mask is None:
        key_mask = jnp.ones((b, nk), bool)
    mp = jnp.pad(key_mask.astype(jnp.int32), ((0, 0), (0, nk_pad - nk)))[:, None, :]
    return qp, kp, vp, mp, nq_pad, nk_pad


def _flash_forward_with_lse(q, k, v, key_mask, scale, block_q, block_k):
    b, nq, d = q.shape
    scale_val = scale if scale is not None else 1.0 / math.sqrt(d)
    qp, kp, vp, mp, nq_pad, nk_pad = _pad_inputs(q, k, v, key_mask, block_q, block_k)
    num_kv_blocks = nk_pad // block_k
    grid = (b, nq_pad // block_q, num_kv_blocks)

    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel_with_lse, scale=scale_val, num_kv_blocks=num_kv_blocks
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, 1, nq_pad), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b_, i, j: (b_, 0, j)),
            ],
            out_specs=(
                pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
                pl.BlockSpec((1, 1, block_q), lambda b_, i, j: (b_, 0, i)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp, mp)
    return out[:, :nq], lse


def _flash_backward(q, k, v, key_mask, lse, out, g, scale, block_q, block_k):
    """Pallas backward: dk/dv over a (b, kv, q) grid, dq over (b, q, kv)."""
    b, nq, d = q.shape
    nk = k.shape[1]
    scale_val = scale if scale is not None else 1.0 / math.sqrt(d)
    qp, kp, vp, mp, nq_pad, nk_pad = _pad_inputs(q, k, v, key_mask, block_q, block_k)
    gp = jnp.pad(g, ((0, 0), (0, nq_pad - nq), (0, 0)))
    # delta = rowsum(dO * O) — cheap elementwise, computed in XLA
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )
    dp_pad = jnp.pad(delta, ((0, 0), (0, nq_pad - nq)))[:, None, :]
    # padded query rows: lse is 0 there, s = 0 - 0 → p = exp(0 - 0)=1?
    # guard: set their lse to +inf so p = 0 in the backward recompute
    row_pad_mask = jnp.arange(nq_pad) < nq
    lse_pad = jnp.where(row_pad_mask[None, None, :], lse, jnp.inf)

    num_q_blocks = nq_pad // block_q
    num_kv_blocks = nk_pad // block_k
    interp = jax.default_backend() != "tpu"

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale_val, num_q_blocks=num_q_blocks
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, nk_pad, d), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, num_kv_blocks, num_q_blocks),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b_, j, i: (b_, i, 0)),  # q
                pl.BlockSpec((1, block_k, d), lambda b_, j, i: (b_, j, 0)),  # k
                pl.BlockSpec((1, block_k, d), lambda b_, j, i: (b_, j, 0)),  # v
                pl.BlockSpec((1, 1, block_k), lambda b_, j, i: (b_, 0, j)),  # mask
                pl.BlockSpec((1, block_q, d), lambda b_, j, i: (b_, i, 0)),  # dO
                pl.BlockSpec((1, 1, block_q), lambda b_, j, i: (b_, 0, i)),  # lse
                pl.BlockSpec((1, 1, block_q), lambda b_, j, i: (b_, 0, i)),  # delta
            ],
            out_specs=(
                pl.BlockSpec((1, block_k, d), lambda b_, j, i: (b_, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b_, j, i: (b_, j, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(qp, kp, vp, mp, gp, lse_pad, dp_pad)

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale_val, num_kv_blocks=num_kv_blocks
        ),
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, d), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, num_q_blocks, num_kv_blocks),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),  # q
                pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),  # k
                pl.BlockSpec((1, block_k, d), lambda b_, i, j: (b_, j, 0)),  # v
                pl.BlockSpec((1, 1, block_k), lambda b_, i, j: (b_, 0, j)),  # mask
                pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),  # dO
                pl.BlockSpec((1, 1, block_q), lambda b_, i, j: (b_, 0, i)),  # lse
                pl.BlockSpec((1, 1, block_q), lambda b_, i, j: (b_, 0, i)),  # delta
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b_, i, j: (b_, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interp,
    )(qp, kp, vp, mp, gp, lse_pad, dp_pad)

    return (
        dq[:, :nq].astype(q.dtype),
        dk[:, :nk].astype(k.dtype),
        dv[:, :nk].astype(v.dtype),
    )


def _flash_fwd_rule(q, k, v, key_mask, scale, block_q, block_k):
    out, lse = _flash_forward_with_lse(q, k, v, key_mask, scale, block_q, block_k)
    return out, (q, k, v, key_mask, lse, out)


def _flash_bwd_rule(scale, block_q, block_k, residuals, g):
    q, k, v, key_mask, lse, out = residuals
    dq, dk, dv = _flash_backward(
        q, k, v, key_mask, lse, out, g, scale, block_q, block_k
    )
    return dq, dk, dv, None


_flash_attention_blocked.defvjp(_flash_fwd_rule, _flash_bwd_rule)
