"""Probe: does materialising the parity max before the column
reduce_window beat XLA's single recomputing fusion for the H-s2d pool?

The in-model pool fusion (bf16[8,240,320,64], 1.10 ms) recomputes the
parity max inside the window reduce, reading U (~316 MB) twice. An
optimization_barrier between the two halves trades that second read for
a 158 MB materialise + re-read: 711 vs 790 MB of traffic on paper.

  python scripts/probe_pool_barrier.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.s2d_conv import maxpool2x2_s2dh_from_raw
from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, HH, W, C2 = 8, 241, 640, 128


def pool_barrier(u):
    hh = u.shape[1] - 1
    c = u.shape[3] // 2
    y = jnp.maximum(u[:, 0:hh, :, :c], u[:, 1:hh + 1, :, c:])
    y = jax.lax.optimization_barrier(y)
    init = jnp.finfo(y.dtype).min
    return jax.lax.reduce_window(
        y, init, jax.lax.max, (1, 1, 2, 1), (1, 1, 2, 1), "VALID"
    )


def timed_scan(fn, u, iters=64):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(u, n):
        def body(x, _):
            out = fn(x)
            upd = (jnp.mean(out.astype(jnp.float32)) * 1e-6).astype(u.dtype)
            return u + upd, None

        xf, _ = jax.lax.scan(body, u, None, length=n)
        return jnp.sum(xf.astype(jnp.float32))

    def best_of(n, reps=3):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_n(u, n))
            best = min(best, time.perf_counter() - t0)
        return best

    float(run_n(u, 4)), float(run_n(u, 4 + iters))
    return (best_of(4 + iters) - best_of(4)) / iters


def main():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(B, HH, W, C2)).astype(np.float32),
                    jnp.bfloat16)
    a = np.asarray(maxpool2x2_s2dh_from_raw(u), np.float32)
    b = np.asarray(pool_barrier(u), np.float32)
    assert np.array_equal(a, b), "barrier form diverged"
    print(f"fused (current): {timed_scan(maxpool2x2_s2dh_from_raw, u)*1e3:.3f} ms",
          flush=True)
    print(f"barrier:         {timed_scan(pool_barrier, u)*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
