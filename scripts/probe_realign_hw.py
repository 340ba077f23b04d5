"""HW-verify + time the v2 realign kernel vs the XLA formulation.

Modes:
  --compile_only   AOT-lower through the Mosaic compile service (safe
                   while another process holds the chip)
  (default)        compile, value-check vs maxpool2x2_s2d_from_raw, and
                   slope-time both paths at the backbone's three pool
                   shapes (bench config: 2B=8 images at 480x640, bf16)

  python scripts/probe_realign_hw.py [--compile_only]
"""
import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.pallas.realign import maxpool_realign_pallas
from image_matching_tpu.ops.s2d_conv import maxpool2x2_s2d_from_raw
from image_matching_tpu.utils.cache import enable_compilation_cache

# (B, H, W, C) of U at the three level-end pools, bench config
SHAPES = [(8, 240, 320, 64), (8, 120, 160, 64), (8, 60, 80, 128)]


def timed_scan(fn, x, delta=64):
    """Carry-dependent scan slope timing (see bench_attention.py)."""

    @partial(jax.jit, static_argnames=("n",))
    def run_n(x, n):
        def body(c, _):
            out = fn(x + c)
            return (jnp.max(out) * 1e-9).astype(x.dtype), None

        carry, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=n)
        return carry

    def best_of(n, reps=3):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run_n(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    float(run_n(x, 4)), float(run_n(x, 4 + delta))
    return (best_of(4 + delta) - best_of(4)) / delta


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--compile_only", action="store_true")
    args = p.parse_args()
    enable_compilation_cache()
    print("device:", jax.devices()[0].device_kind, flush=True)

    for (b, h, w, c) in SHAPES:
        bh = 8 if h % 8 == 0 else 4
        rng = np.random.default_rng(0)
        wp = w + 1 + ((-(w + 1)) % 8)  # stored width, 8-aligned (DMA tiling)
        u = jnp.asarray(
            rng.normal(size=(b, h + 1, wp, 4 * c)), jnp.bfloat16
        )
        fn = lambda x: maxpool_realign_pallas(x, out_w=w, block_rows=bh)
        if args.compile_only:
            try:
                jax.jit(fn).lower(u).compile()
                print(f"U{(b, h, w, c)}: compile ok", flush=True)
            except Exception as e:
                print(f"U{(b, h, w, c)}: COMPILE FAIL "
                      f"{type(e).__name__}: {str(e).splitlines()[0][:200]}")
            continue

        got = np.asarray(fn(u), np.float32)
        ref = np.asarray(maxpool2x2_s2d_from_raw(u, out_w=w), np.float32)
        exact = (got == ref).all()
        t_pl = timed_scan(fn, u)
        t_xla = timed_scan(lambda x: maxpool2x2_s2d_from_raw(x, out_w=w), u)
        print(
            f"U{(b, h, w, c)}: exact={exact} pallas={t_pl*1e3:.3f}ms "
            f"xla={t_xla*1e3:.3f}ms speedup={t_xla/t_pl:.2f}x", flush=True,
        )


if __name__ == "__main__":
    main()
