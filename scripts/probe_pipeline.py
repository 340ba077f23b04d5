"""Decompose the headline-bench pipeline on TPU: backbone forward,
postprocess (NMS/top-k/subpixel/sampling), SuperGlue stack.
Slope-timed over scans of distinct inputs (bench.py methodology).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, K = 8, 480, 640, 1024  # batch-4 pairs = 8 images
N_SMALL, N_LARGE = 2, 8
rng = np.random.default_rng(0)

from image_matching_tpu.models.matching import Matching, MatchingConfig

cfg = MatchingConfig(
    backbone="bn", descriptor_dim=256, max_keypoints=K,
    keypoint_threshold=0.005, gnn_layers=18, sinkhorn_iterations=30,
    match_threshold=0.1, compute_dtype="bfloat16",
)
model = Matching(cfg)
img = jnp.zeros((1, H, W, 1))
variables = model.init(jax.random.PRNGKey(0), img, img)

images = jnp.asarray(rng.uniform(0, 1, (N_LARGE, B, H, W, 1)).astype(np.float32))


def timed(fn, *stacks):
    """fn takes len(stacks) per-step arrays; slope-time a scan over them."""

    @partial(jax.jit, static_argnames=("n",))
    def run_n(*arrs, n):
        def body(c, xs):
            out = fn(*xs)
            # sum EVERY leaf — summing a single output lets XLA
            # dead-code-eliminate the branches that don't feed it
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out))
            return c + tot, None

        tot, _ = jax.lax.scan(body, jnp.zeros(()),
                              tuple(a[:n] for a in arrs))
        return tot

    float(run_n(*stacks, n=N_SMALL))
    float(run_n(*stacks, n=N_LARGE))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); float(run_n(*stacks, n=N_SMALL))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(run_n(*stacks, n=N_LARGE))
        tl = time.perf_counter() - t0
        best = min(best, (tl - ts) / (N_LARGE - N_SMALL))
    return best * 1e3


t_backbone = timed(
    lambda im: model.apply(variables, im,
                           method=lambda m, x: m.superpoint(x)), images)
print(f"backbone fwd (B={B}):        {t_backbone:6.2f} ms")

t_detect = timed(
    lambda im: model.apply(variables, im, method=Matching.detect), images)
print(f"backbone+postproc:          {t_detect:6.2f} ms  "
      f"(postproc {t_detect - t_backbone:.2f})")

t_pair = timed(lambda a, b: model.apply(variables, a, b),
               images[:, : B // 2], images[:, B // 2:])
print(f"full pair batch{B//2}:           {t_pair:6.2f} ms  "
      f"(SG stack {t_pair - t_detect:.2f})")

# SG stack alone on fixed keypoints (detect once outside the scan)
kp_all = jax.jit(
    lambda v, im: model.apply(v, im, method=Matching.detect)
)(variables, images[0])
kp0 = jax.tree_util.tree_map(lambda x: x[: B // 2], kp_all)
kp1 = jax.tree_util.tree_map(lambda x: x[B // 2:], kp_all)
desc_stack = jnp.asarray(
    rng.normal(size=(N_LARGE,) + kp0.desc.shape).astype(np.float32)
)


im0, im1 = images[0, : B // 2], images[0, B // 2:]


def sg_only(d0, d1):
    k0 = kp0.replace(desc=d0)
    k1 = kp1.replace(desc=d1)
    return model.apply(variables, im0, im1, kpts0=k0, kpts1=k1)


t_sg = timed(sg_only, desc_stack, desc_stack + 1.0)
print(f"SG stack alone batch{B//2}:       {t_sg:6.2f} ms")
