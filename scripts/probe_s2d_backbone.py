"""Full s2d-resident backbone vs plain conv backbone on TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from image_matching_tpu.utils.cache import enable_compilation_cache
from image_matching_tpu.ops.s2d_conv import (
    conv3x3_s2d, depth_to_space, maxpool2x2_s2d, space_to_depth,
)
from scripts.probe_backbone import timed, stack, B, H, W, backbone as plain_backbone

enable_compilation_cache()

rng = np.random.default_rng(0)
k = lambda ci, co: jnp.asarray(
    rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.1
).astype(jnp.bfloat16)
k1 = lambda ci, co: jnp.asarray(
    rng.normal(size=(ci, co)).astype(np.float32) * 0.1
).astype(jnp.bfloat16)

w1a, w1b = k(1, 64), k(64, 64)
w2a, w2b = k(64, 64), k(64, 64)
w3a, w3b = k(64, 128), k(128, 128)
w4a, w4b = k(128, 128), k(128, 128)
wpa, wda = k(128, 256), k(128, 256)
wpb, wdb = k1(256, 65), k1(256, 256)


def mm1x1_s2d(x, w):
    """1x1 conv in s2d space: per-parity matmul over the last dim."""
    b, hh, wh, c4 = x.shape
    ci = w.shape[0]
    y = x.reshape(b, hh, wh, 4, ci) @ w
    return y.reshape(b, hh, wh, 4 * w.shape[1])


def s2d_backbone(img):
    x = space_to_depth(img)                     # (240,320,4)
    x = jax.nn.relu(conv3x3_s2d(x, w1a))
    x = jax.nn.relu(conv3x3_s2d(x, w1b))        # (240,320,256) = s2d 480-map
    x = maxpool2x2_s2d(x)                       # (240,320,64) 240-map
    x = space_to_depth(x)
    x = jax.nn.relu(conv3x3_s2d(x, w2a))
    x = jax.nn.relu(conv3x3_s2d(x, w2b))        # (120,160,256)
    x = maxpool2x2_s2d(x)                       # (120,160,64) 120-map
    x = space_to_depth(x)
    x = jax.nn.relu(conv3x3_s2d(x, w3a))
    x = jax.nn.relu(conv3x3_s2d(x, w3b))        # (60,80,512)
    x = maxpool2x2_s2d(x)                       # (60,80,128) 60-map
    x = space_to_depth(x)
    x = jax.nn.relu(conv3x3_s2d(x, w4a))
    x = jax.nn.relu(conv3x3_s2d(x, w4b))        # (30,40,512) = s2d 60-map
    pa = jax.nn.relu(conv3x3_s2d(x, wpa))       # (30,40,1024)
    semi = depth_to_space(mm1x1_s2d(pa, wpb))   # (60,80,65)
    da = jax.nn.relu(conv3x3_s2d(x, wda))
    desc = depth_to_space(mm1x1_s2d(da, wdb))   # (60,80,256)
    return semi.astype(jnp.float32).sum() + desc.astype(jnp.float32).sum()


if __name__ == "__main__":
    x1 = stack((B, H, W, 1))
    t_plain = timed(plain_backbone, x1, label="plain backbone")
    t_s2d = timed(lambda x: s2d_backbone(x), x1, label="s2d backbone")
    print(f"speedup: {t_plain / t_s2d:.2f}x")
