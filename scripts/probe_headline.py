"""Full headline-model sweep: batch x attention impl x side stacking.

Slope-times the complete detect+match forward (bench.py's program) on
the TPU for each combo, printing ms/pair — the decision data for the
headline bench configuration (round-3 perf push).

  python scripts/probe_headline.py [--batch 4 8] [--impl auto flash] [--stack 0 1]
"""
import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.utils.cache import enable_compilation_cache


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, nargs="+", default=[4, 8])
    p.add_argument("--impl", nargs="+", default=["einsum", "flash"])
    p.add_argument("--stack", type=int, nargs="+", default=[0, 1])
    p.add_argument("--layout", nargs="+", default=["h"])
    args = p.parse_args()

    enable_compilation_cache()
    from image_matching_tpu.models.matching import Matching, MatchingConfig

    H, W, N_SMALL, N_LARGE = 480, 640, 4, 12
    rng = np.random.default_rng(0)

    for batch in args.batch:
        stack0 = jnp.asarray(
            rng.uniform(0, 1, (N_LARGE, batch, H, W, 1)).astype(np.float32))
        stack1 = jnp.asarray(
            rng.uniform(0, 1, (N_LARGE, batch, H, W, 1)).astype(np.float32))
        for impl in args.impl:
            for stack in args.stack:
              for layout in args.layout:
                cfg = MatchingConfig(
                    backbone="bn", descriptor_dim=256, max_keypoints=1024,
                    keypoint_threshold=0.005, gnn_layers=18,
                    sinkhorn_iterations=30, match_threshold=0.1,
                    compute_dtype="bfloat16", attention_impl=impl,
                    stack_sides=bool(stack), s2d_layout=layout,
                )
                model = Matching(cfg)
                variables = jax.jit(model.init)(
                    jax.random.PRNGKey(0), stack0[0][:1], stack1[0][:1])

                @partial(jax.jit, static_argnames=("n",))
                def run_n(variables, s0, s1, n):
                    def body(carry, pair):
                        a, b = pair
                        out = model.apply(variables, a, b)
                        return carry + jnp.sum(out["matching_scores0"]), None
                    total, _ = jax.lax.scan(
                        body, jnp.zeros(()), (s0[:n], s1[:n]))
                    return total

                def timed(n, reps=3):
                    float(run_n(variables, stack0, stack1, n))
                    best = np.inf
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        float(run_n(variables, stack0, stack1, n))
                        best = min(best, time.perf_counter() - t0)
                    return best

                per_batch = (timed(N_LARGE) - timed(N_SMALL)) / (N_LARGE - N_SMALL)
                print(
                    f"batch={batch} impl={impl} stack={stack} layout={layout}: "
                    f"{per_batch*1e3:.2f} ms/batch -> "
                    f"{per_batch/batch*1e3:.3f} ms/pair "
                    f"({batch/per_batch:.1f} pairs/s)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
