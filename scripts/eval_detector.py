"""Localization-based detector eval: top-K detections vs synthetic GT.

Reports corner recall/precision at a pixel tolerance (the meaningful
detector metric — pixel-exact heatmap PR at a fixed threshold punishes a
detector for firing 1px off or on unlabeled texture). Runs on CPU.

  python scripts/eval_detector.py --run_dir runs/sp_synth_tpu [--step N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", default="runs/sp_synth_tpu")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--n_batches", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--descriptor_dim", type=int, default=128)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--max_keypoints", type=int, default=64)
    p.add_argument("--threshold", type=float, default=0.015)
    p.add_argument("--tol_px", type=float, default=2.0)
    p.add_argument("--seed", type=int, default=99)
    args = p.parse_args()

    from image_matching_tpu.data.datasets import SyntheticShapesDataset
    from image_matching_tpu.models.superpoint import (
        SuperPointBN,
        superpoint_postprocess,
    )
    from image_matching_tpu.train import create_train_state
    from image_matching_tpu.train.checkpoint import CheckpointManager

    model = SuperPointBN(descriptor_dim=args.descriptor_dim, dtype=jnp.bfloat16)
    example = jnp.zeros((1, args.height, args.width, 1))
    state = create_train_state(
        jax.random.PRNGKey(0), model, (example,),
        tx=optax.adam(1e-4), init_kwargs={"train": True},
    )
    ckpt = CheckpointManager(f"{args.run_dir}/checkpoints")
    state = ckpt.restore(state, step=args.step)
    step = int(state.step)

    @jax.jit
    def detect(variables, images):
        out = model.apply(variables, images)
        return superpoint_postprocess(
            out, max_keypoints=args.max_keypoints,
            threshold=args.threshold, nms_radius=4, border=4,
        )

    ds = SyntheticShapesDataset(args.height, args.width, seed=args.seed)
    it = ds.batches(args.batch_size)
    recalls, precisions, errs = [], [], []
    for _ in range(args.n_batches):
        batch = next(it)
        kp = detect(state.variables, jnp.asarray(batch["image"]))
        for b in range(args.batch_size):
            det = np.asarray(kp.xy[b])[np.asarray(kp.mask[b])]
            gt = batch["points"][b][batch["points_mask"][b]]
            # border: GT corners near the edge can't be detected (border=4)
            inb = (
                (gt[:, 0] >= 6) & (gt[:, 0] < args.width - 6)
                & (gt[:, 1] >= 6) & (gt[:, 1] < args.height - 6)
            )
            gt = gt[inb]
            if len(gt) == 0 or len(det) == 0:
                continue
            d = np.linalg.norm(gt[:, None] - det[None], axis=-1)
            hit = d.min(axis=1) <= args.tol_px
            recalls.append(hit.mean())
            precisions.append((d.min(axis=0) <= args.tol_px).mean())
            if hit.any():
                errs.append(d.min(axis=1)[hit].mean())
    print(
        f"step {step}: corner recall@{args.tol_px}px = {np.mean(recalls):.3f}, "
        f"precision = {np.mean(precisions):.3f}, "
        f"mean localization err = {np.mean(errs):.3f}px "
        f"(K={args.max_keypoints}, thr={args.threshold})"
    )


if __name__ == "__main__":
    main()
