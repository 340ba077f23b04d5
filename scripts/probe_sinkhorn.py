"""TPU probe: fused Pallas Sinkhorn vs the scan path — correctness on
hardware and slope-timed latency at the eval config (K=1024, 30 iters).

  python scripts/probe_sinkhorn.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.sinkhorn import log_optimal_transport
from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, K, ITERS = 4, 1024, 30
N_SMALL, N_LARGE = 4, 16

rng = np.random.default_rng(0)
scores = jnp.asarray(rng.normal(size=(N_LARGE, B, K, K)).astype(np.float32))
mask0 = jnp.asarray(rng.uniform(size=(N_LARGE, B, K)) < 0.9)
mask1 = jnp.asarray(rng.uniform(size=(N_LARGE, B, K)) < 0.9)
alpha = jnp.float32(0.8)

print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)

# correctness on hardware
out_scan = log_optimal_transport(scores[0], alpha, ITERS,
                                 mask0=mask0[0], mask1=mask1[0], impl="scan")
out_pallas = log_optimal_transport(scores[0], alpha, ITERS,
                                   mask0=mask0[0], mask1=mask1[0],
                                   impl="pallas")
diff = float(jnp.max(jnp.abs(out_scan - out_pallas)))
print(f"max |scan - pallas| = {diff:.2e}")
assert diff < 1e-3, "pallas sinkhorn disagrees with scan on TPU"


def timed(impl):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(s, m0, m1, n):
        def body(c, xs):
            sc, a, b_ = xs
            z = log_optimal_transport(sc, alpha, ITERS, mask0=a, mask1=b_,
                                      impl=impl)
            return c + jnp.sum(z[..., :-1, :-1].max(-1)), None

        tot, _ = jax.lax.scan(body, jnp.zeros(()), (s[:n], m0[:n], m1[:n]))
        return tot

    float(run_n(scores, mask0, mask1, N_SMALL))
    float(run_n(scores, mask0, mask1, N_LARGE))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_n(scores, mask0, mask1, N_SMALL))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_n(scores, mask0, mask1, N_LARGE))
        t_l = time.perf_counter() - t0
        best = min(best, (t_l - t_s) / (N_LARGE - N_SMALL))
    return best


t_scan = timed("scan")
t_pallas = timed("pallas")
print(f"scan:   {t_scan*1e3:.3f} ms / batch{B}")
print(f"pallas: {t_pallas*1e3:.3f} ms / batch{B}  ({t_scan/t_pallas:.2f}x)")
