"""Decompose the detect postprocess on TPU: flatten, NMS, top-k,
descriptor sampling. Slope-timed (bench.py methodology)."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.geometry.labels import flatten_detection
from image_matching_tpu.ops.detect import detect_keypoints
from image_matching_tpu.ops.nms import simple_nms
from image_matching_tpu.ops.sampling import sample_descriptors
from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, K, D = 8, 480, 640, 1024, 256
N_SMALL, N_LARGE = 2, 8
rng = np.random.default_rng(0)

semi = jnp.asarray(rng.normal(size=(N_LARGE, B, H // 8, W // 8, 65)).astype(np.float32)).astype(jnp.bfloat16)
heat = jnp.asarray(rng.uniform(0, 1, (N_LARGE, B, H, W)).astype(np.float32))
desc_map = jnp.asarray(rng.normal(size=(N_LARGE, B, H // 8, W // 8, D)).astype(np.float32)).astype(jnp.bfloat16)
xy = jnp.asarray(rng.uniform(0, 1, (N_LARGE, B, K, 2)).astype(np.float32)) * jnp.array([W - 1.0, H - 1.0])


def timed(fn, *stacks):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(*arrs, n):
        def body(c, xs):
            out = fn(*xs)
            tot = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree_util.tree_leaves(out))
            return c + tot, None

        tot, _ = jax.lax.scan(body, jnp.zeros(()), tuple(a[:n] for a in arrs))
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


print(f"flatten_detection:        {timed(lambda s: flatten_detection(s, 8), semi):6.2f} ms")
print(f"simple_nms r=4:           {timed(lambda h: simple_nms(h, 4), heat):6.2f} ms")
print(f"detect_keypoints (all):   {timed(lambda h: detect_keypoints(h, max_keypoints=K, threshold=0.005, nms_radius=4), heat):6.2f} ms")
print(f"sample_descriptors:       {timed(lambda p, d: sample_descriptors(p, d, 8), xy, desc_map):6.2f} ms")
