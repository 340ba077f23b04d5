"""Classical SIFT/ORB registration CLI — the reference's `traditional.py`:
loop source images against a template, resize by `resize_scale`,
detect+match+RANSAC on device, rescale the translation to full
resolution, write warped and match images, print per-pair wall-clock.

Usage:
  python -m image_matching_tpu.cli.traditional \
      --template T.png --source_dir sources/ --out out/ \
      --method sift --resize_scale 0.5
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.data.datasets import SSHIDataset
from image_matching_tpu.features.registration import build_classical_registration_fn
from image_matching_tpu.registration import rescale_transform
from image_matching_tpu.utils.logging import get_logger

log = get_logger("traditional")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--template", required=True)
    p.add_argument("--source_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--method", default="sift", choices=["sift", "orb"])
    p.add_argument("--resize_scale", type=float, default=0.5)
    p.add_argument("--ratio", type=float, default=0.7)
    p.add_argument("--ransac_threshold", type=float, default=7.0)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def _pad_to(img: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.zeros((h, w, 1), np.float32)
    out[: img.shape[0], : img.shape[1]] = img[:h, :w]
    return out


def main():
    from image_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args()
    ds = SSHIDataset(args.template, args.source_dir, args.resize_scale)
    os.makedirs(args.out, exist_ok=True)

    t = ds[0]
    h = max(t["template"].shape[0], t["source"].shape[0])
    w = max(t["template"].shape[1], t["source"].shape[1])

    register = jax.jit(
        build_classical_registration_fn(
            args.method, ratio=args.ratio, ransac_threshold=args.ransac_threshold
        )
    )

    import cv2

    from image_matching_tpu.utils.viz import make_matching_plot, save_image

    key = jax.random.PRNGKey(args.seed)
    for i in range(len(ds)):
        s = ds[i]
        tpl = jnp.asarray(_pad_to(s["template"], h, w))
        src = jnp.asarray(_pad_to(s["source"], h, w))
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        res = register(tpl, src, k)
        n_inl = int(res.fit.num_inliers)
        dt = time.perf_counter() - t0
        log.info(
            "%s: Time used %.3f s, %d matches, %d inliers, valid=%s",
            s["name"], dt, int(res.matches.num_matches()), n_inl,
            bool(res.fit.valid),
        )
        mat = np.asarray(res.fit.matrix)
        full = np.asarray(rescale_transform(jnp.asarray(mat), args.resize_scale))
        np.savetxt(os.path.join(args.out, s["name"] + "_transform.txt"), full)

        # warped template artifact (traditional.py:53's warpAffine output)
        warped = cv2.warpAffine(
            (np.asarray(tpl)[..., 0] * 255).astype(np.uint8), mat, (w, h)
        )
        save_image(os.path.join(args.out, s["name"] + "_warped.png"), warped)
        viz = make_matching_plot(
            np.asarray(tpl), np.asarray(src),
            np.asarray(res.kpts0.xy), np.asarray(res.kpts1.xy),
            np.asarray(res.matches.matches0),
            np.clip(np.asarray(res.matches.scores0), 0, 1),
        )
        save_image(os.path.join(args.out, s["name"] + "_matches.png"), viz)


if __name__ == "__main__":
    main()
