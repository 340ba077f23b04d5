"""Measure the fused Pallas H-s2d entry conv vs the XLA chain on TPU.

Headline shape: image (8, 480, 640) bf16 -> alignedH (8, 240, 640, 128)
with the bias+BN+ReLU epilogue fused. Slope timing (bench.py style).

  python scripts/probe_entry_h.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.pallas.entry_h import (
    _xla_reference,
    entry_h_fused_pallas,
)
from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, CO = 8, 480, 640, 64


def timed_scan(fn, args, iters=64):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(args, n):
        x0, rest = args[0], args[1:]

        def body(x, _):
            out = fn(x, *rest)
            # carry-dependent: perturb the input image by the output mean
            return x0 + (jnp.mean(out.astype(jnp.float32)) * 1e-6
                         ).astype(x0.dtype), None

        xf, _ = jax.lax.scan(body, x0, None, length=n)
        return jnp.sum(xf.astype(jnp.float32))

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
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32),
                      jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, CO)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1, 0.1, (2 * CO,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(0, 0.1, (2 * CO,)).astype(np.float32))
    args = (img, w, scale, shift)

    ref = np.asarray(_xla_reference(*args), np.float32)
    t = timed_scan(_xla_reference, args)
    print(f"xla chain: {t*1e3:.3f} ms", flush=True)

    for variant in ("stack_major",):
        for r in (8, 16, 24):
            if (H // 2) % r:
                continue
            try:
                f = partial(entry_h_fused_pallas, block_rows=r,
                            variant=variant)
                out = np.asarray(f(*args), np.float32)
                d = np.max(np.abs(out - ref))
                t = timed_scan(f, args)
                print(f"pallas {variant} r={r}: {t*1e3:.3f} ms "
                      f"(maxdiff vs xla {d:.4f})", flush=True)
            except Exception as e:
                print(f"pallas {variant} r={r}: FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
