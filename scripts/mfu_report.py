"""Analytic FLOP count + MFU for the headline bench config.

Lowers the bench forward (Matching: detect both images + SuperGlue
match, 480x640, K=1024, 18L GNN, 30 Sinkhorn, bf16, batch 4 pairs) on
CPU and reads XLA's cost analysis. MFU = measured pairs/s x FLOPs/pair
/ peak; v5e bf16 peak = 197 TFLOPS (the repo's own timing-harness
ceiling is ~175 TFLOPS at 8192^3 — both reported).

  python scripts/mfu_report.py [--pairs_per_s 326.6]
"""
import argparse
import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pairs_per_s", type=float, default=326.6)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()

    from image_matching_tpu.models.matching import Matching, MatchingConfig

    cfg = MatchingConfig(
        backbone="bn", descriptor_dim=256, max_keypoints=1024,
        keypoint_threshold=0.005, gnn_layers=18, sinkhorn_iterations=30,
        match_threshold=0.1, compute_dtype="bfloat16",
    )
    model = Matching(cfg)
    b = args.batch
    img0 = jnp.zeros((b, 480, 640, 1), jnp.float32)
    img1 = jnp.zeros((b, 480, 640, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0[:1], img1[:1])

    def fwd(variables, i0, i1):
        return model.apply(variables, i0, i1)

    compiled = jax.jit(fwd).lower(variables, img0, img1).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost["flops"]
    per_pair = flops / b
    pps = args.pairs_per_s
    achieved = per_pair * pps
    print(f"analytic FLOPs/batch{b}: {flops/1e9:.2f} GF  per pair: {per_pair/1e9:.2f} GF")
    for name, peak in (("v5e bf16 peak 197 TF", 197e12),
                       ("measured matmul ceiling 175 TF", 175e12)):
        print(f"MFU vs {name}: {100*achieved/peak:.1f}%  "
              f"({achieved/1e12:.2f} TFLOP/s at {pps} pairs/s)")


if __name__ == "__main__":
    main()
