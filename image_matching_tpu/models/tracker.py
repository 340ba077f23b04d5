"""PointTracker — fixed-memory multi-frame track store, functional & jittable.

Parity: `PointTracker` (superpoint/models/model_wrap.py:355-578): keep the
last L frames of keypoints+descriptors, match each new frame to the
previous one with two-way NN + distance threshold
(`nn_match_two_way`, model_wrap.py:380-423), propagate persistent track
ids, score tracks by averaged match confidence. The reference mutates a
numpy (M, 2+L) matrix on the host; here the state is an explicit pytree
of fixed-shape arrays and `update` is one jitted step, so tracking runs
on-device inside a `lax.scan` over a video if desired.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from image_matching_tpu.ops.matching import match_mutual_nn
from image_matching_tpu.structs import Keypoints


@struct.dataclass
class TrackerState:
    """Ring buffer of the last L frames (newest at index L-1)."""

    xy: jax.Array  # (L, K, 2)
    desc: jax.Array  # (L, K, D)
    mask: jax.Array  # (L, K)
    track_ids: jax.Array  # (L, K) int32, -1 for invalid slots
    track_score: jax.Array  # (L, K) running average match score
    next_id: jax.Array  # () int32
    frame_idx: jax.Array  # () int32

    @property
    def max_length(self) -> int:
        return self.xy.shape[0]

    @property
    def capacity(self) -> int:
        return self.xy.shape[1]


def tracker_init(max_length: int, capacity: int, desc_dim: int) -> TrackerState:
    l, k, d = max_length, capacity, desc_dim
    return TrackerState(
        xy=jnp.zeros((l, k, 2)),
        desc=jnp.zeros((l, k, d)),
        mask=jnp.zeros((l, k), bool),
        track_ids=jnp.full((l, k), -1, jnp.int32),
        track_score=jnp.zeros((l, k)),
        next_id=jnp.zeros((), jnp.int32),
        frame_idx=jnp.zeros((), jnp.int32),
    )


@partial(jax.jit, static_argnames=("max_dist",))
def tracker_update(
    state: TrackerState, kpts: Keypoints, max_dist: float = 0.7
) -> TrackerState:
    """Ingest one frame: match to the previous frame, extend/spawn tracks.

    `max_dist` is the descriptor L2 threshold (`nn_thresh`, the
    reference's default 0.7, model_wrap.py:365)."""
    k = state.capacity
    prev_desc = state.desc[-1]
    prev_mask = state.mask[-1]
    prev_ids = state.track_ids[-1]
    prev_scores = state.track_score[-1]

    res = match_mutual_nn(
        kpts.desc, prev_desc, kpts.mask, prev_mask, max_dist=max_dist
    )
    matched = res.matches0 >= 0  # (K,) new-frame slots matched to previous
    prev_slot = jnp.maximum(res.matches0, 0)

    inherited_ids = jnp.where(matched, prev_ids[prev_slot], -1)
    # brand-new ids for unmatched valid keypoints
    fresh_rank = jnp.cumsum((~matched & kpts.mask).astype(jnp.int32)) - 1
    fresh_ids = state.next_id + fresh_rank
    new_ids = jnp.where(
        matched, inherited_ids, jnp.where(kpts.mask, fresh_ids, -1)
    ).astype(jnp.int32)
    n_new = jnp.sum(~matched & kpts.mask).astype(jnp.int32)

    # running-average track score (reference: avg of match confidences)
    inherited_score = jnp.where(matched, prev_scores[prev_slot], 0.0)
    new_score = jnp.where(
        matched, 0.5 * (inherited_score + res.scores0), kpts.score
    )

    roll = lambda buf, new: jnp.concatenate([buf[1:], new[None]], axis=0)
    return state.replace(
        xy=roll(state.xy, kpts.xy),
        desc=roll(state.desc, kpts.desc),
        mask=roll(state.mask, kpts.mask),
        track_ids=roll(state.track_ids, new_ids),
        track_score=roll(state.track_score, new_score),
        next_id=state.next_id + n_new,
        frame_idx=state.frame_idx + 1,
    )


def track_lengths(state: TrackerState) -> jax.Array:
    """(K,) number of window frames each newest-frame track appears in."""
    newest = state.track_ids[-1][None, :]  # (1, K)
    present = (state.track_ids[:, :, None] == newest) & (newest >= 0)
    return jnp.sum(jnp.any(present, axis=1), axis=0)


@partial(jax.jit, static_argnames=("min_length",))
def get_tracks_dense(state: TrackerState, min_length: int = 2):
    """Device-side track extraction as fixed-shape arrays.

    For every newest-frame slot, locate its track id in each window frame
    with one broadcast compare + argmax (vectorised; no host loop — the
    reference's PointTracker.get_tracks is a numpy row scan,
    model_wrap.py:450-526). Returns a dict:
      tid:     (K,) int32 newest-frame track ids (-1 invalid)
      xy:      (K, L, 2) observation positions per window frame
      present: (K, L) bool observation mask
      valid:   (K,) bool — visible now and ≥ min_length observations
      length:  (K,) int32 observation counts
    Frame f in the window corresponds to absolute frame
    `frame_idx - L + f`.
    """
    ids = state.track_ids  # (L, K)
    newest = ids[-1]  # (K,)
    # (L, slots, tracks): does window-frame slot hold newest track t?
    eq = (ids[:, :, None] == newest[None, None, :]) & (newest >= 0)[None, None, :]
    present = jnp.any(eq, axis=1)  # (L, K_tracks)
    slot = jnp.argmax(eq, axis=1)  # (L, K_tracks) first matching slot
    xy = jnp.take_along_axis(state.xy, slot[..., None], axis=1)  # (L, K, 2)
    length = jnp.sum(present, axis=0).astype(jnp.int32)
    return {
        "tid": newest,
        "xy": xy.transpose(1, 0, 2),
        "present": present.T,
        "valid": (newest >= 0) & (length >= min_length),
        "length": length,
    }


def get_tracks(state: TrackerState, min_length: int = 2):
    """List-of-tuples view of `get_tracks_dense`: [(track_id,
    [(frame, x, y), ...]), ...] for tracks visible in the newest frame
    with ≥ min_length observations. The heavy lifting (per-track slot
    search) runs on device; this only formats the result."""
    import numpy as np

    dense = jax.device_get(get_tracks_dense(state, min_length))
    frame0 = int(state.frame_idx) - state.max_length
    out = []
    for t in np.nonzero(dense["valid"])[0]:
        frames = np.nonzero(dense["present"][t])[0]
        obs = [
            (frame0 + int(f), float(dense["xy"][t, f, 0]), float(dense["xy"][t, f, 1]))
            for f in frames
        ]
        out.append((int(dense["tid"][t]), obs))
    return out
