"""Template-vs-source registration eval — the reference's
`superpoint_flann_test.py` (ratio matcher) and `superpoint_glue_test.py` /
`superpoint_glue_official_test.py` (SuperGlue matcher) in one CLI: for
each source image, detect+match+RANSAC against the template at
`resize_scale`, rescale the transform to full resolution, write warped
and match-viz images, report per-pair wall-clock and inlier counts.

Usage:
  python -m image_matching_tpu.cli.match_pair \
      --template T.png --source_dir sources/ --out out/ \
      --matcher superglue --resize_scale 0.125 \
      --sp_checkpoint runs/sp/checkpoints --sg_checkpoint runs/sg/checkpoints \
      [--backbone vgg --descriptor_dim 256]   # official-weights variant
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.data.datasets import SSHIDataset
from image_matching_tpu.train.checkpoint import load_submodule_checkpoints
from image_matching_tpu.models.matching import Matching, MatchingConfig
from image_matching_tpu.registration import (
    build_registration_fn,
    rescale_transform,
)
from image_matching_tpu.utils.logging import get_logger

log = get_logger("match_pair")

MIN_MATCH_COUNT = 10  # Traditional/registration.py:4


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--template", required=True)
    p.add_argument("--source_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--matcher", default="ratio", choices=["ratio", "superglue"])
    p.add_argument("--backbone", default="bn", choices=["bn", "vgg"])
    p.add_argument("--sp_checkpoint", default=None,
                   help="SuperPoint trainer checkpoint dir")
    p.add_argument("--sg_checkpoint", default=None,
                   help="SuperGlue trainer checkpoint dir")
    p.add_argument("--descriptor_dim", type=int, default=128)
    p.add_argument("--resize_scale", type=float, default=0.25)
    p.add_argument("--max_keypoints", type=int, default=1200)
    p.add_argument("--keypoint_threshold", type=float, default=0.005)
    p.add_argument("--nms_radius", type=int, default=4)
    p.add_argument("--sinkhorn_iterations", type=int, default=30)
    p.add_argument("--match_threshold", type=float, default=0.1)
    p.add_argument("--ratio", type=float, default=0.7)
    p.add_argument("--ransac_threshold", type=float, default=7.0)
    p.add_argument("--ransac_model", default="similarity",
                   choices=["similarity", "homography"])
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
    log.info("%d source images", len(ds))

    cfg = MatchingConfig(
        backbone=args.backbone,
        descriptor_dim=args.descriptor_dim,
        max_keypoints=args.max_keypoints,
        keypoint_threshold=args.keypoint_threshold,
        nms_radius=args.nms_radius,
        keypoint_encoder=(32, 64, 128) if args.descriptor_dim == 128
        else (32, 64, 128, 256),
        sinkhorn_iterations=args.sinkhorn_iterations,
        match_threshold=args.match_threshold,
    )
    model = Matching(cfg)

    # fixed padded shape so one compiled program serves every pair
    t = ds[0]
    h = max(t["template"].shape[0], t["source"].shape[0])
    w = max(t["template"].shape[1], t["source"].shape[1])
    h, w = ((h + 7) // 8) * 8, ((w + 7) // 8) * 8
    example = jnp.zeros((1, h, w, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example, example)
    variables = load_submodule_checkpoints(
        model, variables, cfg, example,
        sp_checkpoint=args.sp_checkpoint, sg_checkpoint=args.sg_checkpoint,
    )

    register = jax.jit(
        build_registration_fn(
            model,
            matcher=args.matcher,
            ratio=args.ratio,
            ransac_model=args.ransac_model,
            ransac_threshold=args.ransac_threshold,
            min_match_count=MIN_MATCH_COUNT,
        )
    )

    from image_matching_tpu.utils.viz import make_matching_plot, save_image

    key = jax.random.PRNGKey(args.seed)
    for i in range(len(ds)):
        s = ds[i]
        tpl = jnp.asarray(_pad_to(s["template"], h, w))[None]
        src = jnp.asarray(_pad_to(s["source"], h, w))[None]
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        res = register(variables, tpl, src, k)
        n_inl = int(res.fit.num_inliers[0])
        dt = time.perf_counter() - t0
        log.info(
            "%s: %.3fs, %d matches, %d inliers, valid=%s",
            s["name"], dt, int(res.matches.num_matches()[0]), n_inl,
            bool(res.fit.valid[0]),
        )

        mat = np.asarray(res.fit.matrix[0])
        full = np.asarray(
            rescale_transform(jnp.asarray(mat), args.resize_scale)
        )
        np.savetxt(os.path.join(args.out, s["name"] + "_transform.txt"), full)

        viz = make_matching_plot(
            np.asarray(tpl[0]), np.asarray(src[0]),
            np.asarray(res.kpts0.xy[0]), np.asarray(res.kpts1.xy[0]),
            np.asarray(res.matches.matches0[0]),
            np.asarray(res.matches.scores0[0]),
        )
        save_image(os.path.join(args.out, s["name"] + "_matches.png"), viz)
        if res.warped is not None:
            save_image(
                os.path.join(args.out, s["name"] + "_warped.png"),
                (np.clip(np.asarray(res.warped[0, :, :, 0]), 0, 1) * 255).astype(
                    np.uint8
                ),
            )


if __name__ == "__main__":
    main()
