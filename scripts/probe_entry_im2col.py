"""A/B the level-1 entry conv formulations on TPU (round 4).

The ci=1 entry conv (image -> 64ch, fused with H-s2d) measured ~1.4 ms
isolated for 0.35 GFLOP useful — XLA's conv lowering pads the
contraction (4*3*1 = 12 taps) to an MXU tile. Candidate: materialise the
12 taps explicitly (im2col via strided slices, a 29 MB bf16 tensor) and
run ONE (B*H/2*W, 12) @ (12, 2co) matmul.

  python scripts/probe_entry_im2col.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.s2d_conv import conv3x3_s2dh_entry, entry_kernel_h
from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, CO = 8, 480, 640, 64
N_SMALL, N_LARGE = 4, 12
rng = np.random.default_rng(0)


def im2col_entry(x, w):
    """conv3x3_s2dh_entry(x, w) via explicit tap gather + matmul.

    x: (B, H, W, ci) direct; w: (3, 3, ci, co). Output alignedH
    (B, H/2, W, 2co), identical math to the stride-(2,1) 4x3 conv."""
    ci, co = w.shape[2], w.shape[3]
    b, h, wd = x.shape[0], x.shape[1], x.shape[2]
    # pad rows (1, 2), cols (1, 1) — entry_kernel_h window anchored at 2i-1
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 1), (0, 0)))
    # taps: 4 rows x 3 cols of the stride-(2,1) window
    cols = []
    for u in range(4):
        for v in range(3):
            cols.append(xp[:, u:u + h:2, v:v + wd, :])
    patches = jnp.concatenate(cols, axis=-1)  # (B, H/2, W, 12*ci)
    kmat = entry_kernel_h(w).reshape(12 * ci, 2 * co)
    return patches @ kmat


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
    print(f"{label:40s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    w = jnp.asarray(rng.normal(size=(3, 3, 1, CO)).astype(np.float32) * 0.5)
    wd = w.astype(jnp.bfloat16)
    x_img = jax.jit(
        lambda: jax.random.uniform(
            jax.random.PRNGKey(0), (N_LARGE, B, H, W, 1), jnp.bfloat16)
    )()

    # exactness first (f32, small shape)
    xs = jnp.asarray(rng.uniform(size=(2, 32, 20, 1)).astype(np.float32))
    a = conv3x3_s2dh_entry(xs, w)
    bb = im2col_entry(xs, w)
    err = float(jnp.max(jnp.abs(a - bb)))
    print(f"im2col exactness vs entry conv: max|d| = {err:.2e}")
    assert err < 1e-5

    timed(lambda x: conv3x3_s2dh_entry(x, wd), x_img, "entry conv (stride-(2,1) 4x3, ci=1)")
    timed(lambda x: im2col_entry(x, wd), x_img, "im2col + matmul (ci=1)")

    # also at level 2 shape (ci=64, 240x320 direct in)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.1)
    w2d = w2.astype(jnp.bfloat16)
    x2 = jax.jit(
        lambda: jax.random.uniform(
            jax.random.PRNGKey(1), (N_LARGE, B, H // 2, W // 2, 64), jnp.bfloat16)
    )()
    timed(lambda x: conv3x3_s2dh_entry(x, w2d), x2, "L2 entry conv (ci=64)")
    timed(lambda x: im2col_entry(x, w2d), x2, "L2 im2col + matmul (ci=64)")


if __name__ == "__main__":
    main()
