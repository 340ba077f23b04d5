"""Time the full level-1 entry chain (fused entry kernel + in-level
conv) under three couplings:

  a) bhwc kernel output + NHWC conv   (committed round-4 state)
  b) hwbc kernel output + transpose + NHWC conv (XLA materialises it)
  c) hwbc kernel output + HWNC-labelled conv (no transpose at all)

  python scripts/probe_entry_chain.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.pallas.entry_h import entry_h_fused_pallas
from image_matching_tpu.ops.s2d_conv import conv3x3_s2dh_raw, s2dh_kernel_all
from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, CO = 8, 480, 640, 64


def timed_scan(fn, args, iters=64):
    @partial(jax.jit, static_argnames=("n",))
    def run_n(args, n):
        x0, rest = args[0], args[1:]

        def body(x, _):
            out = fn(x, *rest)
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
    w1 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, CO)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, CO, CO)).astype(np.float32),
                     jnp.bfloat16)
    scale = jnp.asarray(rng.normal(1, 0.1, (2 * CO,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(0, 0.1, (2 * CO,)).astype(np.float32))

    def chain_a(img):
        a = entry_h_fused_pallas(img, w1, scale, shift, block_rows=8,
                                 out_layout="bhwc")
        return conv3x3_s2dh_raw(a, w2)

    def chain_b(img):
        a = entry_h_fused_pallas(img, w1, scale, shift, block_rows=8,
                                 out_layout="hwbc")  # transposes internally
        return conv3x3_s2dh_raw(a, w2)

    def chain_c(img):
        a = entry_h_fused_pallas(img, w1, scale, shift, block_rows=8,
                                 out_layout="hwbc_raw")  # (H/2, W, B*2co)
        a = a.reshape(H // 2, W, B, 2 * CO)
        return jax.lax.conv_general_dilated(
            a, s2dh_kernel_all(w2), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("HWNC", "HWIO", "NHWC"),
            preferred_element_type=a.dtype,
        )

    ref = np.asarray(chain_a(img), np.float32)
    for name, fn in (("a bhwc+NHWC", chain_a), ("b hwbc+T+NHWC", chain_b),
                     ("c hwbc+HWNC", chain_c)):
        try:
            out = np.asarray(fn(img), np.float32)
            d = np.max(np.abs(out - ref))
            t = timed_scan(fn, (img,))
            print(f"{name}: {t*1e3:.3f} ms (maxdiff {d:.4f})", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
