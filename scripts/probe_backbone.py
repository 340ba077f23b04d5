"""Per-stage TPU timing probe for the SuperPoint backbone.

Slope-timing over scans of DISTINCT inputs (bench.py methodology): a
scan whose body ignores the iteration index gets hoisted by XLA and
measures nothing, so each op is fed a stack of different batches.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W = 8, 480, 640  # batch-4 pairs = 8 images
N_SMALL, N_LARGE = 2, 6

rng = np.random.default_rng(0)


def stack(shape):
    return jnp.asarray(
        rng.uniform(size=(N_LARGE,) + shape).astype(np.float32)
    ).astype(jnp.bfloat16)


def timed(fn, xs, reps=3, label=""):
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
    print(f"{label:28s} {ms:7.2f} ms")
    return ms


k = lambda ci, co: jnp.asarray(
    rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.1
).astype(jnp.bfloat16)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )


w1a, w1b = k(1, 64), k(64, 64)
w2a, w2b = k(64, 64), k(64, 64)
w3a, w3b = k(64, 128), k(128, 128)
w4a, w4b = k(128, 128), k(128, 128)
wpa, wda = k(128, 256), k(128, 256)


def pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def backbone(x):
    x = jax.nn.relu(conv(x, w1a)); x = jax.nn.relu(conv(x, w1b)); x = pool(x)
    x = jax.nn.relu(conv(x, w2a)); x = jax.nn.relu(conv(x, w2b)); x = pool(x)
    x = jax.nn.relu(conv(x, w3a)); x = jax.nn.relu(conv(x, w3b)); x = pool(x)
    x = jax.nn.relu(conv(x, w4a)); x = jax.nn.relu(conv(x, w4b))
    return jax.nn.relu(conv(x, wpa)) + jax.nn.relu(conv(x, wda))


if __name__ == "__main__":
    x1 = stack((B, H, W, 1))
    x64 = stack((B, H, W, 64))
    x64h = stack((B, H // 2, W // 2, 64))
    x128q = stack((B, H // 4, W // 4, 128))
    x128o = stack((B, H // 8, W // 8, 128))

    total = timed(backbone, x1, label="full backbone")
    t1a = timed(lambda x: conv(x, w1a), x1, label="conv1a (1->64 @480)")
    t1b = timed(lambda x: conv(x, w1b), x64, label="conv1b (64->64 @480)")
    timed(lambda x: conv(x, w2a), x64h, label="conv2a (64->64 @240)")
    timed(lambda x: conv(x, w3b), x128q, label="conv3b (128->128 @120)")
    timed(lambda x: conv(x, wpa), x128o, label="convPa (128->256 @60)")
    timed(pool, x64, label="maxpool @480 64ch")
    timed(lambda x: jax.nn.relu(x), x64, label="relu @480 64ch (bw floor)")

    # conv1b FLOPs: 2*9*64*64*H*W*B
    fl = 2 * 9 * 64 * 64 * H * W * B
    print(f"conv1b: {fl/ (t1b*1e-3) / 1e12:.1f} TFLOPS")
