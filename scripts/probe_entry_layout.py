"""Dump optimized-HLO layouts around the level-1 in-level conv to see
what relayout the Pallas entry kernel's output forces (profiler:
in-level conv 1.293 -> 1.717 ms when its input comes from the kernel).

  python scripts/probe_entry_layout.py [pallas|xla]
"""
import os
import sys
import re

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"

from image_matching_tpu.ops.s2d_conv import conv3x3_s2dh_raw, conv3x3_s2dh_entry
from image_matching_tpu.ops.pallas.entry_h import entry_h_fused_pallas

B, H, W, CO = 8, 480, 640, 64
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32), jnp.bfloat16)
w1 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 1, CO)).astype(np.float32))
w2 = jnp.asarray(rng.normal(0, 0.2, (3, 3, CO, CO)).astype(np.float32), jnp.bfloat16)
scale = jnp.ones((2 * CO,), jnp.float32)
shift = jnp.zeros((2 * CO,), jnp.float32)


def f(img):
    if mode == "pallas":
        a = entry_h_fused_pallas(img, w1, scale, shift)
    else:
        a = jnp.maximum(
            conv3x3_s2dh_entry(img[..., None], w1.astype(jnp.bfloat16)), 0
        )
    return conv3x3_s2dh_raw(a, w2)


txt = jax.jit(f).lower(img).compile().as_text()
for line in txt.splitlines():
    if re.search(r"convolution|custom-call|copy|transpose|bitcast", line):
        print(line.strip()[:300])
