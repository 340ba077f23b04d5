"""Cumulative in-model timing of the headline program (round 4).

Times progressively larger prefixes of the EXACT bench program (same
Matching module, same scan/slope methodology, same shapes) so stage
costs are in-model differences, not isolated-op estimates:

  1. backbone raw maps only (2B images)
  2. + detect postprocess (keypoints + descriptors)
  3. + SuperGlue (the full bench program)

  python scripts/probe_cumulative.py
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

BATCH, H, W, K = 4, 480, 640, 1024
N_SMALL, N_LARGE = 4, 12


def main():
    from image_matching_tpu.models.matching import Matching, MatchingConfig
    from image_matching_tpu.models.superpoint import superpoint_postprocess

    cfg = MatchingConfig(
        backbone="bn", descriptor_dim=256, max_keypoints=K,
        keypoint_threshold=0.005, gnn_layers=18, sinkhorn_iterations=30,
        match_threshold=0.1, compute_dtype="bfloat16",
    )
    model = Matching(cfg)

    rng = np.random.default_rng(0)
    stack0 = jnp.asarray(
        rng.uniform(0, 1, (N_LARGE, BATCH, H, W, 1)).astype(np.float32))
    stack1 = jnp.asarray(
        rng.uniform(0, 1, (N_LARGE, BATCH, H, W, 1)).astype(np.float32))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), stack0[0][:1], stack1[0][:1])

    def backbone_only(a, b):
        img = jnp.concatenate([a, b], axis=0)
        out = model.apply(variables, img,
                          method=lambda m, x: m.superpoint(x))
        return jnp.sum(out["semi"]) + jnp.sum(out["desc_map"])

    def detect_only(a, b):
        img = jnp.concatenate([a, b], axis=0)
        kp = model.apply(variables, img, method=Matching.detect)
        return (jnp.sum(kp.xy) + jnp.sum(kp.score)
                + jnp.sum(kp.desc.astype(jnp.float32)))

    def full(a, b):
        out = model.apply(variables, a, b)
        return jnp.sum(out["matching_scores0"])

    def timed(fn, label):
        @partial(jax.jit, static_argnames=("n",))
        def run_n(s0, s1, n):
            def body(c, pair):
                return c + fn(*pair), None
            tot, _ = jax.lax.scan(body, jnp.zeros(()), (s0[:n], s1[:n]))
            return tot

        def t(n, reps=3):
            float(run_n(stack0, stack1, n))
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                float(run_n(stack0, stack1, n))
                best = min(best, time.perf_counter() - t0)
            return best

        ms = 1e3 * (t(N_LARGE) - t(N_SMALL)) / (N_LARGE - N_SMALL)
        print(f"{label:44s} {ms:7.3f} ms/batch{BATCH}", flush=True)
        return ms

    t1 = timed(backbone_only, "backbone raw maps (2B imgs)")
    t2 = timed(detect_only, "+ detect postprocess (= detect total)")
    t3 = timed(full, "+ superglue (= full bench program)")
    print(f"{'postprocess delta':44s} {t2 - t1:7.3f} ms")
    print(f"{'superglue delta':44s} {t3 - t2:7.3f} ms")


if __name__ == "__main__":
    main()
