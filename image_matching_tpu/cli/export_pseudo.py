"""Homographic-adaptation pseudo-label export — the reference's
`superpoint_export_pseudo.py` as a batched on-device pipeline: for every
train/val image, aggregate the detector over N random warps, NMS, top-k,
subpixel-refine, and write `<name>.npz` (pts rows x, y, score) plus an
optional overlay png.

Usage:
  python -m image_matching_tpu.cli.export_pseudo \
      --data_root datasets/ALLSS --out Results/pseudo_labels \
      --checkpoint runs/superpoint/checkpoints
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.data.datasets import ALLSSDataset
from image_matching_tpu.export import ExportConfig, make_export_fn
from image_matching_tpu.models.superpoint import SuperPointBN
from image_matching_tpu.train import create_train_state
from image_matching_tpu.train.checkpoint import CheckpointManager
from image_matching_tpu.utils.logging import get_logger

log = get_logger("export_pseudo")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--task", default="train", choices=["train", "val"])
    p.add_argument("--descriptor_dim", type=int, default=128)
    p.add_argument("--num_homographies", type=int, default=50)
    p.add_argument("--top_k", type=int, default=1200)
    p.add_argument("--detection_threshold", type=float, default=0.015)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--viz", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    from image_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args()
    ds = ALLSSDataset(args.data_root, args.task, resize=(args.height, args.width))
    log.info("%d images in %s/%s", len(ds), args.data_root, args.task)

    model = SuperPointBN(descriptor_dim=args.descriptor_dim, dtype=jnp.bfloat16)
    example = jnp.zeros((1, args.height, args.width, 1))
    if args.checkpoint:
        state = create_train_state(
            jax.random.PRNGKey(0), model, (example,), init_kwargs={"train": True}
        )
        if args.checkpoint.endswith(".npz"):
            from image_matching_tpu.utils.weights import load_npz_into

            loaded = load_npz_into(
                {"params": state.params, "batch_stats": state.batch_stats},
                args.checkpoint,
            )
            state = state.replace(
                params=loaded["params"], batch_stats=loaded["batch_stats"]
            )
        else:
            state = CheckpointManager(args.checkpoint).restore(state)
        variables = state.variables
        log.info("loaded checkpoint step %d", int(state.step))
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), example)
        log.warning("no checkpoint given — exporting with random weights")

    cfg = ExportConfig(
        num_homographies=args.num_homographies,
        top_k=args.top_k,
        detection_threshold=args.detection_threshold,
    )
    export = make_export_fn(model, variables, cfg)

    out_dir = os.path.join(args.out, args.task)
    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    for start in range(0, len(ds), args.batch_size):
        samples = [ds[i] for i in range(start, min(start + args.batch_size, len(ds)))]
        images = jnp.asarray(np.stack([s["image"] for s in samples]))
        key, k = jax.random.split(key)
        kpts = export(k, images)
        for i, s in enumerate(samples):
            mask = np.asarray(kpts.mask[i])
            pts = np.concatenate(
                [np.asarray(kpts.xy[i]), np.asarray(kpts.score[i])[:, None]], -1
            )[mask]
            np.savez_compressed(os.path.join(out_dir, s["name"] + ".npz"), pts=pts)
            if args.viz:
                from image_matching_tpu.utils.viz import draw_keypoints, save_image

                img = draw_keypoints(s["image"], pts[:, :2])
                save_image(os.path.join(out_dir, s["name"] + "_viz.png"), img)
        log.info("exported %d/%d", min(start + args.batch_size, len(ds)), len(ds))


if __name__ == "__main__":
    main()
