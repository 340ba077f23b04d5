"""A/B the fused realign+maxpool formulations on TPU (round 4).

Current maxpool2x2_s2dh_from_raw = row-parity max + reduce_window over
W pairs: 1.10 ms in-model at level 1 vs a ~0.5 ms traffic floor
(profiler ledger). Candidate: reshape Uh (B, H/2+1, W, 2C) ->
(B, H/2+1, W/2, 4C) — a row-major bitcast that folds each W pair into
channels — then ONE max over four channel slices (no reduce_window, no
W strides; rows shift by the parity offset as before).

  python scripts/probe_pool4.py
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

B = 8
N_SMALL, N_LARGE = 4, 12


def pool4(u):
    """maxpool2x2_s2dh_from_raw via W-pair channel folding."""
    b, h1, w, c2 = u.shape
    c = c2 // 2
    ur = u.reshape(b, h1, w // 2, 2 * c2)
    return jnp.maximum(
        jnp.maximum(ur[:, 0:h1 - 1, :, 0:c], ur[:, 1:h1, :, c:c2]),
        jnp.maximum(ur[:, 0:h1 - 1, :, c2:c2 + c], ur[:, 1:h1, :, c2 + c:]),
    )


def timed(fn, xs, label, reps=5):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(xs, n):
        def body(c, x):
            return c + jnp.sum(fn(x).astype(jnp.float32)), None
        tot, _ = jax.lax.scan(body, jnp.zeros(()), xs[:n])
        return tot

    def t(n):
        float(run_n(xs, n))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_n(xs, n))
            best = min(best, time.perf_counter() - t0)
        return best

    ms = 1e3 * (t(N_LARGE) - t(N_SMALL)) / (N_LARGE - N_SMALL)
    print(f"{label:44s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    # exactness (CPU-friendly shapes, f32)
    us = jnp.asarray(rng.normal(size=(2, 17, 24, 10)).astype(np.float32))
    a, b = maxpool2x2_s2dh_from_raw(us), pool4(us)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"pool4 exactness: max|d| = {err:.2e} {a.shape} {b.shape}")
    assert err == 0.0

    for (h1, w, c2), tag in [
        ((241, 640, 128), "L1"),
        ((121, 320, 128), "L2"),
        ((61, 160, 256), "L3"),
    ]:
        u = jax.jit(
            lambda h1=h1, w=w, c2=c2: jax.random.normal(
                jax.random.PRNGKey(0), (N_LARGE, B, h1, w, c2), jnp.bfloat16)
        )()
        timed(maxpool2x2_s2dh_from_raw, u, f"{tag} reduce_window form")
        timed(pool4, u, f"{tag} channel-fold form")


if __name__ == "__main__":
    main()
