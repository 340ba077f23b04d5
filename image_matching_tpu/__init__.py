"""image_matching_tpu — a TPU-native image-registration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
PH8411/image-matching reference (SuperPoint + SuperGlue + classical
SIFT/ORB registration), built TPU-first:

- static shapes everywhere (fixed-K keypoint sets with validity masks),
- bf16 matmuls on the MXU with f32 accumulation,
- Pallas kernels for the hot ops (blockwise GNN attention, fused NMS),
- `jax.sharding.Mesh` + `shard_map`/`jit` parallelism (data / context axes)
  instead of the reference's single-process `nn.DataParallel`.

Layout (mirrors SURVEY.md §7):
    geometry/  homography sampling, point/image warps, label ops
    ops/       NMS, descriptor sampling, KNN matching, RANSAC, Sinkhorn
    features/  classical detectors (DoG/SIFT-style, FAST+BRIEF-style)
    models/    SuperPoint & SuperGlue (flax.linen), Matching wrapper
    losses/    detector BCE, sparse descriptor contrastive, SuperGlue NLL
    data/      datasets, on-device augmentation, pipelines
    train/     train states, trainers, checkpointing, metrics
    parallel/  mesh setup, sharding rules, context-parallel attention
    cli/       entry points mirroring the reference's scripts
"""

__version__ = "0.1.0"

from image_matching_tpu.structs import Keypoints  # noqa: F401
