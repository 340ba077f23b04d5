"""Measure Pallas flash attention vs the XLA einsum path on the TPU.

Times forward AND forward+backward at several keypoint counts to set
FLASH_MIN_KEYPOINTS (models/superglue.py) from data (VERDICT round-1
item 4). Slope timing inside one jitted scan, as bench.py.

  python scripts/bench_attention.py
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.pallas.attention import (
    attention_reference,
    flash_attention,
)
from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, D = 8, 64  # batch×heads fold, head dim (SuperGlue: 4 heads × 64)
N_SMALL, N_LARGE = 2, 6


def timed_scan(fn, args, n_small=N_SMALL, n_large=N_LARGE):
    """Time fn(*args) via slope of an in-jit scan (relay-safe)."""

    @partial(jax.jit, static_argnames=("n",))
    def run_n(args, n):
        def body(carry, _):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + jnp.sum(leaf.astype(jnp.float32)) * 1e-9, None

        total, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
        return total

    float(run_n(args, n_large))  # compile + warm
    ts = {}
    for n in (n_small, n_large):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_n(args, n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n_large] - ts[n_small]) / (n_large - n_small)


def main():
    rng = np.random.default_rng(0)
    results = {}
    for n in (1024, 2048, 4096, 8192):
        q = jnp.asarray(rng.normal(size=(B, n, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, n, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, n, D)), jnp.bfloat16)
        mask = jnp.asarray(rng.uniform(size=(B, n)) < 0.9)

        fwd = {}
        fwd["einsum"] = timed_scan(attention_reference, (q, k, v, mask))
        fwd["flash"] = timed_scan(flash_attention, (q, k, v, mask))

        def loss_ein(q, k, v):
            return jnp.sum(attention_reference(q, k, v, mask).astype(jnp.float32))

        def loss_fla(q, k, v):
            return jnp.sum(flash_attention(q, k, v, mask).astype(jnp.float32))

        bwd = {}
        bwd["einsum"] = timed_scan(jax.grad(loss_ein, (0, 1, 2)), (q, k, v))
        bwd["flash"] = timed_scan(jax.grad(loss_fla, (0, 1, 2)), (q, k, v))

        results[n] = {
            "fwd_ms": {k_: v_ * 1e3 for k_, v_ in fwd.items()},
            "fwd_bwd_ms": {k_: v_ * 1e3 for k_, v_ in bwd.items()},
        }
        print(n, json.dumps(results[n]), flush=True)

    with open("runs/attention_bench.json", "w") as f:
        json.dump(
            {
                "device": str(jax.devices()[0].device_kind),
                "shape": {"batch_x_heads": B, "head_dim": D},
                "results": results,
            },
            f, indent=2,
        )
    print("wrote runs/attention_bench.json")


if __name__ == "__main__":
    main()
