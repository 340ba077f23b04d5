"""Measure one-pass attention vs einsum vs flash at SuperGlue shapes.

  python scripts/probe_attn_onepass.py [fold] [N ...]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.pallas.attention import (
    attention_onepass,
    attention_reference,
    flash_attention,
)
from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
D = 64


def timed_scan(fn, args, iters=256):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(args, n):
        q0, rest = args[0], args[1:]

        def body(q, _):
            out = fn(q, *rest)
            return q0 + (out * 1e-6).astype(q0.dtype), None

        qf, _ = jax.lax.scan(body, q0, None, length=n)
        return jnp.sum(qf.astype(jnp.float32))

    def best_of(n, reps=3):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_n(args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    float(run_n(args, 4)), float(run_n(args, 4 + iters))
    return (best_of(4 + iters) - best_of(4)) / iters


def main():
    argv = sys.argv[1:]
    fold = int(argv[0]) if argv else 16
    ns = tuple(int(a) for a in argv[1:]) or (1024, 2048, 4096)
    rng = np.random.default_rng(0)
    for n in ns:
        q = jnp.asarray(rng.normal(size=(fold, n, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(fold, n, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(fold, n, D)), jnp.bfloat16)
        mask = jnp.asarray(rng.uniform(size=(fold, n)) < 0.9)
        row = {}
        row["einsum"] = timed_scan(attention_reference, (q, k, v, mask))
        row["flash"] = timed_scan(flash_attention, (q, k, v, mask))
        for bq in (256, 512, 1024):
            if bq > n:
                continue
            f = partial(attention_onepass, block_q=bq)
            # correctness spot check on hardware
            d_ = np.max(np.abs(
                np.asarray(f(q, k, v, mask), np.float32)
                - np.asarray(attention_reference(q, k, v, mask), np.float32)
            ))
            row[f"onepass{bq}"] = timed_scan(f, (q, k, v, mask))
            row[f"onepass{bq}_diff"] = d_
        print(f"fold={fold} N={n}: " + "  ".join(
            f"{k_}={v_*1e3:.3f}ms" if not k_.endswith("diff")
            else f"({v_:.4f})"
            for k_, v_ in row.items()
        ), flush=True)


if __name__ == "__main__":
    main()
