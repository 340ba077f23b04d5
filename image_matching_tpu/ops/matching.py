"""Descriptor matching as batched MXU matmuls — no trees, no host loops.

Replaces the reference's OpenCV matchers: FLANN KD-tree 2-NN + Lowe ratio
(superpoint_flann_test.py:69-77, Traditional/registration.py:20-29), the
brute-force Hamming matcher with cross-check
(Traditional/registration.py:66-68), and PointTracker's two-way NN with
distance threshold (superpoint/models/model_wrap.py:380-423). At the
reference's keypoint counts (≤ ~1200) a dense similarity matmul on the
MXU beats any tree, and it vmaps over the batch.

All matchers consume fixed-K masked sets and emit `MatchResult` with -1
for "no match" (same contract as SuperGlue's output).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from image_matching_tpu.structs import MatchResult

NEG_INF = -1e9


def pairwise_sqdist(d0: jax.Array, d1: jax.Array) -> jax.Array:
    """Squared L2 distances (..., N0, N1) via one matmul (f32 accumulate)."""
    sim = jnp.einsum(
        "...nd,...md->...nm", d0, d1, preferred_element_type=jnp.float32
    )
    n0 = jnp.sum(d0.astype(jnp.float32) ** 2, axis=-1)[..., :, None]
    n1 = jnp.sum(d1.astype(jnp.float32) ** 2, axis=-1)[..., None, :]
    return jnp.maximum(n0 + n1 - 2.0 * sim, 0.0)


def _masked_sim(d0, d1, mask0, mask1):
    sim = jnp.einsum(
        "...nd,...md->...nm", d0, d1, preferred_element_type=jnp.float32
    )
    valid = mask0[..., :, None] & mask1[..., None, :]
    return jnp.where(valid, sim, NEG_INF), valid


@partial(jax.jit, static_argnames=("cross_check",))
def match_ratio_mutual(
    d0: jax.Array,
    d1: jax.Array,
    mask0: jax.Array,
    mask1: jax.Array,
    ratio: float = 0.7,
    cross_check: bool = True,
) -> MatchResult:
    """2-NN + Lowe ratio test (+ optional mutual check) for unit descriptors.

    For L2-normalised descriptors dist² = 2 - 2·sim, so the top-2 by
    similarity are the top-2 by distance and the ratio test
    `d1 < ratio · d2` becomes `(2-2s1) < ratio²·(2-2s2)`.
    """
    sim, _ = _masked_sim(d0, d1, mask0, mask1)
    top2, idx2 = jax.lax.top_k(sim, 2)  # (..., N0, 2)
    best1 = idx2[..., 0]
    s1, s2 = top2[..., 0], top2[..., 1]
    dist1 = jnp.maximum(2.0 - 2.0 * s1, 0.0)
    dist2 = jnp.maximum(2.0 - 2.0 * s2, 0.0)
    pass_ratio = dist1 < (ratio * ratio) * dist2
    valid0 = pass_ratio & mask0 & (s1 > NEG_INF / 2)

    best0_of_1 = jnp.argmax(sim, axis=-2)  # (..., N1): best row for each col
    if cross_check:
        k0 = jnp.arange(d0.shape[-2])
        mutual = jnp.take_along_axis(best0_of_1, best1, axis=-1) == k0
        valid0 = valid0 & mutual

    matches0 = jnp.where(valid0, best1, -1)
    # invert: matches1[j] = i iff matches0[i] == j
    matches1, scores1 = _invert_matches(matches0, s1, d1.shape[-2])
    scores0 = jnp.where(valid0, s1, 0.0)
    return MatchResult(
        matches0=matches0.astype(jnp.int32),
        matches1=matches1.astype(jnp.int32),
        scores0=scores0,
        scores1=scores1,
    )


@jax.jit
def ratio_gate_matches(
    matches: MatchResult,
    d0: jax.Array,
    d1: jax.Array,
    mask0: jax.Array,
    mask1: jax.Array,
    gate: float = 0.9,
) -> MatchResult:
    """Descriptor-consistency gate over an existing match set.

    Keeps match (i, j) only if its descriptor distance beats the best
    *alternative* column by the Lowe ratio `gate`:
    dist(i, j) < gate² · min_{m≠j} dist(i, m). With gate=0.7 this is
    the strict reference ratio test (superpoint_flann_test.py:77)
    restricted to the given assignments; looser gates (0.9-1.0) keep
    context-validated SuperGlue matches that a strict ratio would drop
    while still rejecting descriptor-ambiguous assignments — the
    failure mode that drags the RANSAC fit on perspective scenes.
    """
    sim, _ = _masked_sim(d0, d1, mask0, mask1)  # (..., N0, N1)
    j = jnp.maximum(matches.matches0, 0)
    sim_j = jnp.take_along_axis(sim, j[..., None], axis=-1)[..., 0]
    n1 = sim.shape[-1]
    is_j = jnp.arange(n1) == j[..., None]
    alt = jnp.max(jnp.where(is_j, NEG_INF, sim), axis=-1)
    dist_j = jnp.maximum(2.0 - 2.0 * sim_j, 0.0)
    dist_alt = jnp.maximum(2.0 - 2.0 * alt, 0.0)
    # strict < (OpenCV d1 < ratio*d2): an exact-duplicate
    # alternative (both distances 0) must fail the gate
    ok = (matches.matches0 >= 0) & (dist_j < (gate * gate) * dist_alt)
    matches0 = jnp.where(ok, matches.matches0, -1).astype(jnp.int32)
    scores0 = jnp.where(ok, matches.scores0, 0.0)
    matches1, scores1 = _invert_matches(matches0, scores0, n1)
    return MatchResult(
        matches0=matches0,
        matches1=matches1.astype(jnp.int32),
        scores0=scores0,
        scores1=scores1,
    )


def match_mutual_nn(
    d0: jax.Array,
    d1: jax.Array,
    mask0: jax.Array,
    mask1: jax.Array,
    max_dist: float = jnp.inf,
) -> MatchResult:
    """Two-way nearest-neighbour matching with an L2 distance cutoff —
    the matcher of PointTracker (`nn_match_two_way`, model_wrap.py:380-423)
    and of GlueSparse's GT-correspondence builder (GlueSparse.py:63-70)."""
    sim, _ = _masked_sim(d0, d1, mask0, mask1)
    best1 = jnp.argmax(sim, axis=-1)  # (..., N0)
    best0 = jnp.argmax(sim, axis=-2)  # (..., N1)
    s1 = jnp.max(sim, axis=-1)
    k0 = jnp.arange(d0.shape[-2])
    mutual = jnp.take_along_axis(best0, best1, axis=-1) == k0
    dist = jnp.sqrt(jnp.maximum(2.0 - 2.0 * s1, 0.0))
    valid0 = mutual & mask0 & (s1 > NEG_INF / 2) & (dist < max_dist)
    matches0 = jnp.where(valid0, best1, -1)
    matches1, scores1 = _invert_matches(matches0, s1, d1.shape[-2])
    return MatchResult(
        matches0=matches0.astype(jnp.int32),
        matches1=matches1.astype(jnp.int32),
        scores0=jnp.where(valid0, s1, 0.0),
        scores1=scores1,
    )


@jax.jit
def match_hamming(
    bits0: jax.Array,
    bits1: jax.Array,
    mask0: jax.Array,
    mask1: jax.Array,
) -> MatchResult:
    """Brute-force Hamming matching with cross-check for binary descriptors.

    TPU formulation of `BFMatcher(NORM_HAMMING, crossCheck=True)`
    (Traditional/registration.py:66-68): unpack bits to ±1 and take one
    bf16 matmul on the MXU — hamming = (nbits - dot)/2 — instead of
    popcount loops.

    bits0/bits1: (..., N, nbytes) uint8 packed descriptors.
    """
    pm0 = _unpack_pm1(bits0)
    pm1 = _unpack_pm1(bits1)
    nbits = pm0.shape[-1]
    dot = jnp.einsum(
        "...nd,...md->...nm",
        pm0.astype(jnp.bfloat16),
        pm1.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    ham = (nbits - dot) * 0.5
    valid = mask0[..., :, None] & mask1[..., None, :]
    ham = jnp.where(valid, ham, jnp.inf)

    best1 = jnp.argmin(ham, axis=-1)
    best0 = jnp.argmin(ham, axis=-2)
    h1 = jnp.min(ham, axis=-1)
    k0 = jnp.arange(bits0.shape[-2])
    mutual = jnp.take_along_axis(best0, best1, axis=-1) == k0
    valid0 = mutual & mask0 & jnp.isfinite(h1)
    matches0 = jnp.where(valid0, best1, -1)
    score = jnp.where(valid0, -h1, 0.0)  # higher = better
    matches1, scores1 = _invert_matches(matches0, -h1, bits1.shape[-2])
    return MatchResult(
        matches0=matches0.astype(jnp.int32),
        matches1=matches1.astype(jnp.int32),
        scores0=score,
        scores1=scores1,
    )


def _unpack_pm1(bits: jax.Array) -> jax.Array:
    """(..., nbytes) uint8 -> (..., nbytes*8) in {-1, +1} (MSB first)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    b = (bits[..., None] >> shifts) & 1
    b = b.reshape(bits.shape[:-1] + (bits.shape[-1] * 8,))
    return b.astype(jnp.float32) * 2.0 - 1.0


def _invert_matches(matches0: jax.Array, scores_for0: jax.Array, n1: int):
    """Build matches1/scores1 from matches0 by scatter (batched)."""

    def one(m0, s0):
        tgt = jnp.where(m0 >= 0, m0, n1)  # dump slot
        m1 = jnp.full((n1 + 1,), -1, dtype=jnp.int32)
        m1 = m1.at[tgt].set(jnp.arange(m0.shape[0], dtype=jnp.int32))
        s1 = jnp.zeros((n1 + 1,), dtype=scores_for0.dtype)
        s1 = s1.at[tgt].set(s0)
        return m1[:n1], s1[:n1]

    batch_shape = matches0.shape[:-1]
    m0f = matches0.reshape((-1, matches0.shape[-1]))
    s0f = scores_for0.reshape((-1, scores_for0.shape[-1]))
    m1, s1 = jax.vmap(one)(m0f, s0f)
    return m1.reshape(batch_shape + (n1,)), s1.reshape(batch_shape + (n1,))


def gather_matched_points(
    xy0: jax.Array, xy1: jax.Array, result: MatchResult
):
    """Pack matched coordinate pairs into fixed-size arrays + mask.

    Returns (p0, p1, valid): p0/p1 (..., K0, 2); valid (..., K0) — row i
    pairs xy0[i] with xy1[matches0[i]] where matched.
    """
    idx = jnp.maximum(result.matches0, 0)
    p1 = jnp.take_along_axis(xy1, idx[..., None], axis=-2)
    valid = result.matches0 >= 0
    return xy0, p1, valid
