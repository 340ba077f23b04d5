"""Hypothesis probe: MXU-shaped equivalents of the hot backbone convs."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from image_matching_tpu.utils.cache import enable_compilation_cache
from scripts.probe_backbone import timed, stack, B, H, W

enable_compilation_cache()

rng = np.random.default_rng(1)
k = lambda kh, kw, ci, co: jnp.asarray(
    rng.normal(size=(kh, kw, ci, co)).astype(np.float32) * 0.1
).astype(jnp.bfloat16)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )


if __name__ == "__main__":
    # S2D equivalent of conv1b: 2x2 conv 256->256 @ 240x320 (same FLOPs)
    xs2d = stack((B, H // 2, W // 2, 256))
    w22 = k(2, 2, 256, 256)
    t = timed(lambda x: conv(x, w22), xs2d, label="2x2 256->256 @240 (s2d eq)")
    fl = 2 * 4 * 256 * 256 * (H // 2) * (W // 2) * B
    print(f"  -> {fl / (t * 1e-3) / 1e12:.1f} TFLOPS")

    # how do TFLOPS scale with channel width at full res?
    x64 = stack((B, H, W, 64))
    for co in (64, 128, 256):
        w33 = k(3, 3, 64, co)
        t = timed(lambda x, w=w33: conv(x, w), x64, label=f"3x3 64->{co} @480")
        fl = 2 * 9 * 64 * co * H * W * B
        print(f"  -> {fl / (t * 1e-3) / 1e12:.1f} TFLOPS")
