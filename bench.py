"""Headline benchmark: SuperPoint+SuperGlue detect+match pairs/s per chip.

Config mirrors the reference's SP+SG eval regime (BASELINE.md): 480x640
grayscale pair, descriptor_dim 256, 18 GNN layers, 30 Sinkhorn
iterations, max 1024 keypoints — both detections + matching end-to-end
as one jitted program in bf16.

Measurement notes: this environment reaches the TPU through a relay on
which `block_until_ready` can acknowledge before device completion, so
naive wall-clock timing over-reports. We therefore (a) scan N distinct
pair-batches inside ONE jitted program whose output is a scalar that is
read back to the host (forcing real completion), and (b) time two
different N and take the slope, cancelling the constant relay overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` compares against the reference-implementation rerun
recorded in reference_baseline.json (torch, CPU — no CUDA GPU exists in
this environment; see BASELINE.md).
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import os

BATCH = int(os.environ.get("BENCH_BATCH", "4"))
HEIGHT, WIDTH = 480, 640
MAX_KEYPOINTS = 1024
N_SMALL, N_LARGE = 4, 12


def main() -> None:
    from image_matching_tpu.models.matching import Matching, MatchingConfig
    from image_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = MatchingConfig(
        backbone="bn",
        descriptor_dim=256,
        max_keypoints=MAX_KEYPOINTS,
        keypoint_threshold=0.005,
        gnn_layers=18,
        sinkhorn_iterations=30,
        match_threshold=0.1,
        compute_dtype="bfloat16",
    )
    model = Matching(cfg)

    rng = np.random.default_rng(0)
    stack0 = jnp.asarray(
        rng.uniform(0, 1, (N_LARGE, BATCH, HEIGHT, WIDTH, 1)).astype(np.float32)
    )
    stack1 = jnp.asarray(
        rng.uniform(0, 1, (N_LARGE, BATCH, HEIGHT, WIDTH, 1)).astype(np.float32)
    )
    dev = jax.devices()[0]
    print(f"bench: device {dev.device_kind} ({dev.platform})", file=sys.stderr)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), stack0[0][:1], stack1[0][:1])

    @partial(jax.jit, static_argnames=("n",))
    def run_n(variables, s0, s1, n):
        def body(carry, pair):
            a, b = pair
            out = model.apply(variables, a, b)
            return carry + jnp.sum(out["matching_scores0"]), None

        total, _ = jax.lax.scan(body, jnp.zeros(()), (s0[:n], s1[:n]))
        return total

    def timed(n, reps=3):
        float(run_n(variables, stack0, stack1, n))  # compile + warm
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_n(variables, stack0, stack1, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_small = timed(N_SMALL)
    t_large = timed(N_LARGE)
    per_batch = (t_large - t_small) / (N_LARGE - N_SMALL)
    pairs_per_s = BATCH / per_batch
    print(
        f"bench: t({N_SMALL})={t_small*1e3:.1f}ms t({N_LARGE})={t_large*1e3:.1f}ms "
        f"-> {per_batch*1e3:.2f} ms/batch{BATCH} -> {pairs_per_s:.2f} pairs/s",
        file=sys.stderr,
    )

    vs_baseline = None
    try:
        with open("reference_baseline.json") as f:
            ref = json.load(f)
        base = ref.get("superpoint_superglue_pairs_per_s")
        if base:
            vs_baseline = pairs_per_s / base
    except FileNotFoundError:
        pass

    print(
        json.dumps(
            {
                "metric": "superpoint+superglue detect+match throughput "
                f"(480x640, K={MAX_KEYPOINTS}, 18L GNN, 30 sinkhorn, bf16)",
                "value": round(pairs_per_s, 3),
                "unit": "pairs/s/chip",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
