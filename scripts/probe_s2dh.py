"""H-only s2d conv vs (2,2) s2d conv vs direct, at backbone shapes.

Slope-times the level-1 in-level conv (the ledger's biggest single op)
and the fused conv+pool level in all three formulations on the TPU —
the decision data for the v3 backbone layout (round-3 perf push).

  python scripts/probe_s2dh.py
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
    conv3x3_s2d_raw,
    conv3x3_s2dh_raw,
    maxpool2x2_s2d_from_raw,
    maxpool2x2_s2dh_from_raw,
    s2d_kernel_all,
    s2dh_kernel_all,
)
from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_SMALL, N_LARGE = 2, 6
rng = np.random.default_rng(0)


def device_stack(shape):
    """Generate the input stack on-device — a host upload of these
    multi-GB stacks through the relay takes minutes."""
    return jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    )()


def timed(fn, xs, label, useful_gflop):
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
    print(f"{label}: {per*1e3:.3f} ms  ({useful_gflop/per/1e3:.1f} useful TFLOPS)",
          flush=True)
    return per


def main():
    B, H, W, C = 8, 480, 640, 64
    useful = 2 * B * H * W * 9 * C * C / 1e9  # GFLOP of the plain 3x3
    w3 = jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)), jnp.bfloat16)

    # level-1 in-level conv alone
    x2d = device_stack((N_LARGE, B, H // 2, W // 2, 4 * C))
    timed(lambda x: conv3x3_s2d_raw(x, w3), x2d, "conv s2d(2,2) raw", useful)
    xh = device_stack((N_LARGE, B, H // 2, W, 2 * C))
    timed(lambda x: conv3x3_s2dh_raw(x, w3), xh, "conv s2d(2,1) raw", useful)
    xd = device_stack((N_LARGE, B, H, W, C))
    timed(
        lambda x: jax.lax.conv_general_dilated(
            x, w3, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16),
        xd, "conv direct 3x3", useful)

    # conv + realigning pool (what the model actually runs per level)
    timed(lambda x: maxpool2x2_s2d_from_raw(conv3x3_s2d_raw(x, w3)),
          x2d, "conv+pool s2d(2,2)", useful)
    timed(lambda x: maxpool2x2_s2dh_from_raw(conv3x3_s2dh_raw(x, w3)),
          xh, "conv+pool s2d(2,1)", useful)


if __name__ == "__main__":
    main()
