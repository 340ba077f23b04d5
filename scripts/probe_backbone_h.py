"""Per-level TPU timing of the H-s2d backbone at the bench config.

Slope-times each op of the in-model fast path (SuperPointBN s2d_layout
"h") at batch 8 images (= bench batch-4 pairs), bf16: entry/raw convs,
fused pools, realign + heads — the round-4 ledger refresh.

  python scripts/probe_backbone_h.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.ops.s2d_conv import (
    conv3x3_s2dh_entry,
    conv3x3_s2dh_raw,
    maxpool2x2_s2dh_from_raw,
    mm1x1_s2dh,
    realign_h,
)
from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W = 8, 480, 640
N_SMALL, N_LARGE = 2, 6
rng = np.random.default_rng(0)


def device_stack(shape):
    return jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    )()


def kern(ci, co):
    return jnp.asarray(
        rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)


def timed(fn, xs, label, useful_gflop=None):
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

    ms = 1e3 * (t(N_LARGE) - t(N_SMALL)) / (N_LARGE - N_SMALL)
    extra = ""
    if useful_gflop is not None:
        extra = f"  ({useful_gflop / ms * 1e3 / 1e3:.0f} useful TFLOPS)"
    print(f"{label:34s} {ms:7.3f} ms{extra}", flush=True)
    return ms


def main():
    gf = lambda h, w, ci, co: 2 * 9 * ci * co * h * w * B / 1e9

    # level shapes (full-res h, w, channels)
    x_img = device_stack((N_LARGE, B, H, W, 1))
    a1 = device_stack((N_LARGE, B, H // 2, W, 128))       # alignedH L1
    u1 = device_stack((N_LARGE, B, H // 2 + 1, W, 128))   # Uh L1
    d2 = device_stack((N_LARGE, B, H // 2, W // 2, 64))   # direct L2 in
    a2 = device_stack((N_LARGE, B, H // 4, W // 2, 128))
    u2 = device_stack((N_LARGE, B, H // 4 + 1, W // 2, 128))
    d3 = device_stack((N_LARGE, B, H // 4, W // 4, 64))
    a3 = device_stack((N_LARGE, B, H // 8, W // 4, 256))
    u3 = device_stack((N_LARGE, B, H // 8 + 1, W // 4, 256))
    d4 = device_stack((N_LARGE, B, H // 8, W // 8, 128))
    a4 = device_stack((N_LARGE, B, H // 16, W // 8, 256))
    u4 = device_stack((N_LARGE, B, H // 16 + 1, W // 8, 256))

    k1a, k1b = kern(1, 64), kern(64, 64)
    k2a, k2b = kern(64, 64), kern(64, 64)
    k3a, k3b = kern(64, 128), kern(128, 128)
    k4a, k4b = kern(128, 128), kern(128, 128)
    kpa = kern(128, 256)

    total = 0.0
    total += timed(lambda x: conv3x3_s2dh_entry(x, k1a), x_img,
                   "conv1a entry (1->64 @480x640)", gf(H, W, 1, 64))
    total += timed(lambda x: conv3x3_s2dh_raw(x, k1b), a1,
                   "conv1b raw   (64->64 @480x640)", gf(H, W, 64, 64))
    total += timed(maxpool2x2_s2dh_from_raw, u1, "pool1 (Uh -> direct 240x320)")
    total += timed(lambda x: conv3x3_s2dh_entry(x, k2a), d2,
                   "conv2a entry (64->64 @240x320)", gf(H // 2, W // 2, 64, 64))
    total += timed(lambda x: conv3x3_s2dh_raw(x, k2b), a2,
                   "conv2b raw   (64->64 @240x320)", gf(H // 2, W // 2, 64, 64))
    total += timed(maxpool2x2_s2dh_from_raw, u2, "pool2 (Uh -> direct 120x160)")
    total += timed(lambda x: conv3x3_s2dh_entry(x, k3a), d3,
                   "conv3a entry (64->128 @120x160)", gf(H // 4, W // 4, 64, 128))
    total += timed(lambda x: conv3x3_s2dh_raw(x, k3b), a3,
                   "conv3b raw   (128->128 @120x160)", gf(H // 4, W // 4, 128, 128))
    total += timed(maxpool2x2_s2dh_from_raw, u3, "pool3 (Uh -> direct 60x80)")
    total += timed(lambda x: conv3x3_s2dh_entry(x, k4a), d4,
                   "conv4a entry (128->128 @60x80)", gf(H // 8, W // 8, 128, 128))
    total += timed(lambda x: conv3x3_s2dh_raw(x, k4b), a4,
                   "conv4b raw   (128->128 @60x80)", gf(H // 8, W // 8, 128, 128))
    total += timed(realign_h, u4, "realign_h (Uh L4)")
    total += timed(lambda x: conv3x3_s2dh_raw(x, kpa), a4,
                   "convPa raw   (128->256 @60x80)", gf(H // 8, W // 8, 128, 256))
    print(f"{'sum of isolated ops':34s} {total:7.3f} ms")


if __name__ == "__main__":
    main()
