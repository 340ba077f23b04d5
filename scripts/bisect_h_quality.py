"""Bisect the H-layout (s2d v3) quality regression on TPU.

Round-5 item 1 (VERDICT round 4): `--s2d_backbone h` measures 2.13 px
corner error / 345 matches at the reference regime where `off` measures
0.46 px / 660. f32 CPU parity tests pass, so the defect is specific to
the TPU/bf16 path. This probe compares, ON THE DEVICE IN bf16:

  1. each H-layout op vs its plain-layout equivalent at real shapes;
  2. the full SuperPointBN forward (h / 2x2 / off) on a real
     photo-texture image with the banked weights, reporting dense-output
     deltas and keypoint-set overlap.

Run: python scripts/bisect_h_quality.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from image_matching_tpu.ops import s2d_conv as s2d


def diffstat(name, a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = np.abs(a - b)
    scale = max(np.abs(b).max(), 1e-6)
    print(f"{name:36s} max|d|={d.max():.5f} rel={d.max() / scale:.5f} "
          f"mean|d|={d.mean():.6f} (ref max {np.abs(b).max():.3f})")
    return d.max() / scale


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    print("device:", jax.devices()[0])

    B, H, W = 2, 480, 640
    img = rng.standard_normal((B, H, W, 1)).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, 1, 64)) * 0.2).astype(np.float32)

    x = jnp.asarray(img, dt)
    k = jnp.asarray(w1)

    # --- op 1: entry conv ci=1 (tap-as-channels _entry_h_mm path) ---
    ref = jax.jit(lambda x, k: s2d.space_to_depth_h(
        jax.lax.conv_general_dilated(
            x, k.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt)))(x, k)
    got = jax.jit(lambda x, k: s2d.conv3x3_s2dh_entry(x, k.astype(dt)))(x, k)
    diffstat("entry ci=1 (_entry_h_mm)", got, ref)

    # --- op 1b: entry conv ci=64 (4x3 stride-(2,1) conv path) ---
    x64 = jnp.asarray(rng.standard_normal((B, H // 2, W // 2, 64)), dt)
    k64 = jnp.asarray((rng.standard_normal((3, 3, 64, 64)) * 0.05), jnp.float32)
    ref = jax.jit(lambda x, k: s2d.space_to_depth_h(
        jax.lax.conv_general_dilated(
            x, k.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt)))(x64, k64)
    got = jax.jit(lambda x, k: s2d.conv3x3_s2dh_entry(x, k.astype(dt)))(x64, k64)
    diffstat("entry ci=64 (4x3 conv)", got, ref)

    # --- op 2: raw conv in alignedH space ---
    xh = jnp.asarray(rng.standard_normal((B, H // 2, W, 128)), dt)
    kr = jnp.asarray((rng.standard_normal((3, 3, 64, 64)) * 0.05), jnp.float32)
    ref = jax.jit(lambda x, k: s2d.space_to_depth_h(
        jax.lax.conv_general_dilated(
            s2d.depth_to_space_h(x), k.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt)))(xh, kr)
    got = jax.jit(
        lambda x, k: s2d.realign_h(s2d.conv3x3_s2dh_raw(x, k.astype(dt)))
    )(xh, kr)
    diffstat("raw conv (alignedH)", got, ref)

    # --- op 3: pool from raw ---
    uh = jnp.asarray(rng.standard_normal((B, H // 2 + 1, W, 128)), dt)
    ref = jax.jit(lambda u: jax.lax.reduce_window(
        s2d.depth_to_space_h(s2d.realign_h(u)),
        jnp.finfo(dt).min, jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID"))(uh)
    got = jax.jit(s2d.maxpool2x2_s2dh_from_raw)(uh)
    diffstat("pool from raw", got, ref)

    # --- op 4: Pallas entry_h_fused (hardware) vs XLA reference ---
    from image_matching_tpu.ops.pallas import entry_h as eh
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 128), jnp.float32)
    shift = jnp.asarray(rng.uniform(-0.5, 0.5, 128), jnp.float32)
    imgs = jnp.asarray(img[..., 0], jnp.float32)
    ref = jax.jit(eh._xla_reference)(imgs.astype(dt), k, scale, shift)
    got = jax.jit(eh.entry_h_fused)(imgs.astype(dt), k, scale, shift)
    diffstat("pallas entry_h_fused", got, ref)

    # --- full model: h vs off with banked weights on a photo image ---
    from image_matching_tpu.evaluation import make_eval_pairs
    from image_matching_tpu.models.superpoint import (
        SuperPointBN, superpoint_postprocess)
    from image_matching_tpu.utils.weights import load_npz

    pairs = make_eval_pairs(np.random.default_rng(0), 1, 480, 640,
                            texture="photo")
    image = jnp.asarray(pairs[0].image0)[None]
    variables = load_npz("weights/sp_photo.npz")

    outs = {}
    for mode in ("off", "2x2", "h"):
        m = SuperPointBN(descriptor_dim=128, dtype=dt,
                         s2d=mode != "off",
                         s2d_layout=mode if mode != "off" else "h")
        f = jax.jit(lambda v, im, m=m: m.apply(v, im, train=False))
        outs[mode] = jax.tree.map(np.asarray, f(variables, image))

    for mode in ("2x2", "h"):
        print(f"--- full model {mode} vs off ---")
        diffstat(f"semi[{mode}]", outs[mode]["semi"], outs["off"]["semi"])
        diffstat(f"desc[{mode}]", outs[mode]["desc_map"],
                 outs["off"]["desc_map"])

    # keypoint overlap
    for mode in ("off", "2x2", "h"):
        m = SuperPointBN(descriptor_dim=128, dtype=dt,
                         s2d=mode != "off",
                         s2d_layout=mode if mode != "off" else "h")
        f = jax.jit(lambda v, im, m=m: superpoint_postprocess(
            m.apply(v, im, train=False), 1200, threshold=0.005))
        kp = f(variables, image)
        xy = np.asarray(kp.xy[0])[np.asarray(kp.mask[0])]
        sc = np.asarray(kp.scores[0])[np.asarray(kp.mask[0])]
        print(f"{mode}: n_kpts={len(xy)} score_mean={sc.mean():.4f} "
              f"xy_mean={xy.mean(0)}")
        outs[mode + "_xy"] = xy

    from scipy.spatial import cKDTree
    t = cKDTree(outs["off_xy"])
    for mode in ("2x2", "h"):
        d, _ = t.query(outs[mode + "_xy"], k=1)
        print(f"{mode} vs off: kpt NN dist mean={d.mean():.3f} "
              f"frac<1px={(d < 1).mean():.3f}")


if __name__ == "__main__":
    main()
