"""SuperPointBN inference: plain vs fused-s2d path on TPU (real model)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from image_matching_tpu.utils.cache import enable_compilation_cache
from image_matching_tpu.models.superpoint import SuperPointBN
from scripts.probe_backbone import timed, stack, B, H, W

enable_compilation_cache()

if __name__ == "__main__":
    img = stack((B, H, W, 1)).astype(jnp.float32)
    plain = SuperPointBN(descriptor_dim=256, dtype=jnp.bfloat16, s2d=False)
    fast = SuperPointBN(descriptor_dim=256, dtype=jnp.bfloat16, s2d=True)
    v = plain.init(jax.random.PRNGKey(0), img[0])

    def run(model):
        def f(x):
            out = model.apply(v, x)
            return out["semi"].astype(jnp.float32).sum() + out[
                "desc_map"
            ].astype(jnp.float32).sum()
        return f

    t_plain = timed(run(plain), img, label="SuperPointBN plain")
    t_fast = timed(run(fast), img, label="SuperPointBN s2d-fused")
    print(f"speedup: {t_plain / t_fast:.2f}x")
    # numeric sanity on-device
    o_p = plain.apply(v, img[0])
    o_f = fast.apply(v, img[0])
    d = jnp.abs(o_p["semi"] - o_f["semi"]).max()
    print("max |semi delta| (bf16 path):", float(d))
