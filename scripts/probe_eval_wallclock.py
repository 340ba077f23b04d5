"""Diagnose the SP+FLANN vs SP+SG eval wall-clock gap (VERDICT r2 weak #6).

EVAL_learned.json showed sp=389.7s vs spsg=28.0s for the same 50 pairs.
This times compile and steady-state per-pair dispatch for both matchers
at the same config to localise the difference.

  python scripts/probe_eval_wallclock.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.models.matching import Matching, MatchingConfig
from image_matching_tpu.registration import build_registration_fn
from image_matching_tpu.utils.cache import enable_compilation_cache

H, W, K = 240, 320, 512


def main():
    enable_compilation_cache()
    cfg = MatchingConfig(
        backbone="bn", descriptor_dim=128, max_keypoints=K,
        keypoint_threshold=0.001, subpixel=True,
        keypoint_encoder=(32, 64, 128), sinkhorn_iterations=30,
        match_threshold=0.1,
    )
    model = Matching(cfg)
    example = jnp.zeros((1, H, W, 1))
    variables = model.init(jax.random.PRNGKey(0), example, example)
    rng = np.random.default_rng(0)

    for name in ("sp", "spsg"):
        fn = jax.jit(build_registration_fn(
            model, matcher="ratio" if name == "sp" else "superglue",
            ransac_threshold=5.0, min_match_count=8, produce_warp=False,
        ))
        t = jnp.asarray(rng.uniform(0, 1, (1, H, W, 1)), jnp.float32)
        s = jnp.asarray(rng.uniform(0, 1, (1, H, W, 1)), jnp.float32)
        key = jax.random.PRNGKey(1)

        t0 = time.perf_counter()
        res = fn(variables, t, s, key)
        jax.block_until_ready(res)
        t_compile = time.perf_counter() - t0

        # steady state: 5 fresh pairs, same shapes
        times = []
        for i in range(5):
            t = jnp.asarray(rng.uniform(0, 1, (1, H, W, 1)), jnp.float32)
            s = jnp.asarray(rng.uniform(0, 1, (1, H, W, 1)), jnp.float32)
            key = jax.random.PRNGKey(2 + i)
            t0 = time.perf_counter()
            res = fn(variables, t, s, key)
            jax.block_until_ready(res)
            times.append(time.perf_counter() - t0)
        # host-side result extraction (what evaluate_pipeline does)
        t0 = time.perf_counter()
        _ = (bool(res.fit.valid[0]), np.asarray(res.fit.matrix[0]),
             int(res.matches.num_matches()[0]), int(res.fit.num_inliers[0]))
        t_extract = time.perf_counter() - t0
        print(f"{name}: compile+first={t_compile:.2f}s "
              f"per-pair={np.median(times)*1e3:.1f}ms "
              f"(min {min(times)*1e3:.1f} max {max(times)*1e3:.1f}) "
              f"extract={t_extract*1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
