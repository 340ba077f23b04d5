"""W-pool formulation shootout for the H-s2d pipeline (ops/s2d_conv v3).

The H-s2d fused conv+pool needs a column-pairwise max after the free
row-parity max; the first formulation (reshape (W/2, 2) + max) measured
3.0 ms vs the (2,2) pool's 1.3 ms. Candidates here keep the conv fixed
and vary only the pool lowering.

  python scripts/probe_poolh.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.s2d_conv import conv3x3_s2dh_raw
from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_SMALL, N_LARGE = 2, 6


def timed(fn, xs, label):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(xs, n):
        def body(c, x):
            return c + jnp.sum(fn(x).astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.zeros(()), xs[:n])
        return tot

    def t(n, reps=3):
        float(run_n(xs, n))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_n(xs, n))
            best = min(best, time.perf_counter() - t0)
        return best

    per = (t(N_LARGE) - t(N_SMALL)) / (N_LARGE - N_SMALL)
    print(f"{label}: {per*1e3:.3f} ms", flush=True)
    return per


def rowmax(u):
    hh = u.shape[1] - 1
    c = u.shape[3] // 2
    return jnp.maximum(u[:, 0:hh, :, :c], u[:, 1:hh + 1, :, c:])


def pool_reshape(u):
    y = rowmax(u)
    b, hh, w_, c = y.shape
    return jnp.max(y.reshape(b, hh, w_ // 2, 2, c), axis=3)


def pool_reduce_window(u):
    y = rowmax(u)
    return jax.lax.reduce_window(
        y, -jnp.inf if y.dtype == jnp.float32 else jnp.finfo(y.dtype).min,
        jax.lax.max, (1, 1, 2, 1), (1, 1, 2, 1), "VALID",
    )


def pool_strided(u):
    y = rowmax(u)
    return jnp.maximum(y[:, :, 0::2], y[:, :, 1::2])


def pool_wfirst_reshape(u):
    b, h1, w_, c2 = u.shape
    yw = jnp.max(u.reshape(b, h1, w_ // 2, 2, c2), axis=3)
    hh = h1 - 1
    c = c2 // 2
    return jnp.maximum(yw[:, 0:hh, :, :c], yw[:, 1:hh + 1, :, c:])


def main():
    B, H, W, C = 8, 480, 640, 64
    w3 = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.05, (3, 3, C, C)), jnp.bfloat16)
    xh = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (N_LARGE, B, H // 2, W, 2 * C), jnp.bfloat16))()

    conv = lambda x: conv3x3_s2dh_raw(x, w3)
    timed(conv, xh, "conv alone")
    for name, pool in [
        ("reshape", pool_reshape),
        ("reduce_window", pool_reduce_window),
        ("strided", pool_strided),
        ("wfirst_reshape", pool_wfirst_reshape),
    ]:
        timed(lambda x, p=pool: p(conv(x)), xh, f"conv+pool {name}")


if __name__ == "__main__":
    main()
