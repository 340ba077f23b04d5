"""TPU timing: Pallas im2col entry conv vs the XLA stride-2 formulation.

Per-level shapes of the SuperPoint s2d backbone at 480x640 batch-8
(= batch-4 pairs, the headline bench regime). Also times the full
SuperPointBN forward to show the end-to-end effect.

  python scripts/probe_entry_conv.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from image_matching_tpu.utils.cache import enable_compilation_cache
from image_matching_tpu.ops.s2d_conv import conv3x3_s2d_entry
from image_matching_tpu.ops.pallas.entry_conv import entry_conv_pallas
from scripts.probe_backbone import timed, stack

enable_compilation_cache()

rng = np.random.default_rng(0)

# (H, W, ci, co): entry convs of levels 1-4 at 480x640
LEVELS = [
    (480, 640, 1, 64),
    (240, 320, 64, 64),
    (120, 160, 64, 128),
    (60, 80, 128, 128),
]

for h, w, ci, co in LEVELS:
    xs = stack((8, h, w, ci))
    k = jnp.asarray(
        rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    flops = 2 * 8 * h * w * 9 * ci * co
    t_x = timed(lambda x: conv3x3_s2d_entry(x, k), xs)
    t_p = timed(lambda x: entry_conv_pallas(x, k), xs)
    print(
        f"L({h}x{w} {ci}->{co}): xla {t_x*1e3:7.3f} ms ({flops/t_x/1e12:6.1f} TF)"
        f" | pallas {t_p*1e3:7.3f} ms ({flops/t_p/1e12:6.1f} TF)",
        flush=True,
    )

# end-to-end model forward (entry_conv dispatches to Pallas on TPU)
from image_matching_tpu.models.superpoint import SuperPointBN

model = SuperPointBN(descriptor_dim=256, dtype=jnp.bfloat16, s2d=True)
img = jnp.zeros((8, 480, 640, 1), jnp.bfloat16)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
imgs = stack((8, 480, 640, 1))
t = timed(lambda x: model.apply(variables, x)["semi"], imgs)
print(f"SuperPointBN fwd batch-8: {t*1e3:.2f} ms", flush=True)
