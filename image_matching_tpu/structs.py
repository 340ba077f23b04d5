"""Core pytree datatypes.

The reference keeps keypoints as dynamically-shaped lists/tensors
(`torch.nonzero` at superpoint/models/superpoint_test.py:135-138), which
forces host syncs and recompiles. Here every keypoint set is a fixed-K
masked struct so the whole detect→match→fit pipeline stays inside one
XLA program.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Keypoints:
    """A fixed-capacity, masked set of keypoints.

    Attributes:
      xy:    (..., K, 2) float — (x, y) pixel coordinates.
      score: (..., K) float — detector confidence; 0 for invalid slots.
      mask:  (..., K) bool — True for valid slots.
      desc:  optional (..., K, D) float — L2-normalised descriptors.
    """

    xy: jax.Array
    score: jax.Array
    mask: jax.Array
    desc: Optional[jax.Array] = None

    @property
    def capacity(self) -> int:
        return self.xy.shape[-2]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.mask, axis=-1)

    def replace_desc(self, desc: jax.Array) -> "Keypoints":
        return self.replace(desc=desc)


@struct.dataclass
class MatchResult:
    """Matches between two fixed-K keypoint sets.

    Same contract as the reference SuperGlue output dict
    (superglue/models/superglue_test.py:280-285): -1 marks "no match".

    Attributes:
      matches0: (..., K0) int32 — index into set1 or -1.
      matches1: (..., K1) int32 — index into set0 or -1.
      scores0:  (..., K0) float — matching confidence.
      scores1:  (..., K1) float.
    """

    matches0: jax.Array
    matches1: jax.Array
    scores0: jax.Array
    scores1: jax.Array

    def num_matches(self) -> jax.Array:
        return jnp.sum(self.matches0 >= 0, axis=-1)


@struct.dataclass
class RobustFit:
    """Result of a robust (RANSAC) model fit.

    Attributes:
      matrix:      (..., 2, 3) affine or (..., 3, 3) homography.
      inliers:     (..., N) bool mask over the match candidates.
      num_inliers: (...,) int32.
      valid:       (...,) bool — False when too few matches to fit.
    """

    matrix: jax.Array
    inliers: jax.Array
    num_inliers: jax.Array
    valid: jax.Array
