"""Train SuperGlue on self-generated warped pairs — the reference's
`superpoint_glue_train.py` rebuilt: pairs are generated on-device inside
the jitted step (no SuperPoint-in-the-dataset), epoch loop with TB
mean-loss logging and per-epoch checkpoints.

Usage:
  python -m image_matching_tpu.cli.train_superglue \
      --data_root datasets/ALLSS --sp_checkpoint runs/superpoint/checkpoints \
      --run_dir runs/superglue --descriptor_dim 128
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from image_matching_tpu.data.datasets import ALLSSDataset, SyntheticShapesDataset
from image_matching_tpu.models.superglue import SuperGlue
from image_matching_tpu.models.superpoint import SuperPointBN
from image_matching_tpu.parallel import make_data_mesh, shard_batch
from image_matching_tpu.train import create_train_state, make_superglue_train_step
from image_matching_tpu.train.checkpoint import CheckpointManager
from image_matching_tpu.train.superglue_trainer import (
    SuperGluePairConfig,
    generate_pair,
)
from image_matching_tpu.utils.logging import get_logger

log = get_logger("train_superglue")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--sp_checkpoint", default=None,
                   help="SuperPoint checkpoint dir (random init if absent)")
    p.add_argument("--run_dir", default="runs/superglue")
    p.add_argument("--descriptor_dim", type=int, default=128)
    p.add_argument("--keypoint_encoder", type=int, nargs="+", default=[32, 64, 128])
    p.add_argument("--gnn_layers", type=int, default=18)
    p.add_argument("--sinkhorn_iterations", type=int, default=100)
    p.add_argument("--max_keypoints", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clip (0 = off, the "
                        "reference's behavior)")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear lr warmup steps (0 = constant lr, the "
                        "reference's behavior)")
    p.add_argument("--cosine_decay_steps", type=int, default=0,
                   help="cosine-decay the lr to lr/10 over this many "
                        "steps (0 = constant, the reference's behavior)")
    p.add_argument("--init_weights", default=None,
                   help="warm-start SuperGlue params from a .npz snapshot "
                        "(step resets to 0; fine-tune entry point)")
    p.add_argument("--subpixel", action="store_true",
                   help="subpixel-refine keypoints in pair generation "
                        "(matches cli/evaluate's inference postprocess)")
    p.add_argument("--gt_dist_thresh", type=float, default=3.0,
                   help="GT correspondence distance in px (GlueSparse.py:70 "
                        "uses 3; tighter teaches more precise match sets)")
    p.add_argument("--photometric", action="store_true",
                   help="independent photometric corruption of each view "
                        "before detection (the hard-regime domain gap)")
    p.add_argument("--perspective_amplitude", type=float, default=0.1,
                   help="homography sampler perspective amplitude "
                        "(reference default 0.1; raise for harder pairs)")
    p.add_argument("--scaling_amplitude", type=float, default=0.1)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--steps_per_epoch", type=int, default=500)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--log_interval", type=int, default=50)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    from image_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args()
    mesh = make_data_mesh(args.batch_size)

    if args.synthetic or args.data_root is None:
        ds = SyntheticShapesDataset(args.height, args.width, seed=args.seed)
        data_iter = ds.batches(args.batch_size)
    else:
        ds = ALLSSDataset(args.data_root, "train",
                          resize=(args.height, args.width))
        data_iter = ds.batches(args.batch_size, seed=args.seed)

    sp = SuperPointBN(descriptor_dim=args.descriptor_dim, dtype=jnp.bfloat16)
    example = jnp.zeros((1, args.height, args.width, 1))
    sp_vars = jax.jit(sp.init)(jax.random.PRNGKey(0), example)
    if args.sp_checkpoint:
        from image_matching_tpu.train import create_train_state as _cts

        sp_state = _cts(jax.random.PRNGKey(0), sp, (example,),
                        init_kwargs={"train": True})
        if args.sp_checkpoint.endswith(".npz"):
            from image_matching_tpu.utils.weights import load_npz_into

            loaded = load_npz_into(
                {"params": sp_state.params,
                 "batch_stats": sp_state.batch_stats},
                args.sp_checkpoint,
            )
            sp_state = sp_state.replace(
                params=loaded["params"], batch_stats=loaded["batch_stats"]
            )
        else:
            sp_state = CheckpointManager(args.sp_checkpoint).restore(sp_state)
        sp_vars = sp_state.variables
        log.info("loaded SuperPoint from %s", args.sp_checkpoint)

    sg = SuperGlue(
        descriptor_dim=args.descriptor_dim,
        keypoint_encoder=tuple(args.keypoint_encoder),
        gnn_layers=args.gnn_layers,
        sinkhorn_iterations=args.sinkhorn_iterations,
        dtype=jnp.bfloat16,
    )
    from image_matching_tpu.data.photometric import PhotometricConfig
    from image_matching_tpu.geometry.homography import HomographyConfig

    cfg = SuperGluePairConfig(
        max_keypoints=args.max_keypoints,
        subpixel=args.subpixel,
        gt_dist_thresh=args.gt_dist_thresh,
        homography=HomographyConfig(
            patch_ratio=0.85, allow_artifacts=True,
            perspective_amplitude_x=args.perspective_amplitude,
            perspective_amplitude_y=args.perspective_amplitude,
            scaling_amplitude=args.scaling_amplitude,
        ),
        photometric=PhotometricConfig(enable=args.photometric),
    )

    images0 = jnp.zeros((1, args.height, args.width, 1))
    kp0, kp1, *_ = generate_pair(jax.random.PRNGKey(1), sp, sp_vars, images0, cfg)
    if args.warmup_steps > 0:
        lr = optax.linear_schedule(0.0, args.learning_rate, args.warmup_steps)
    elif args.cosine_decay_steps > 0:
        lr = optax.cosine_decay_schedule(
            args.learning_rate, args.cosine_decay_steps, alpha=0.1
        )
    else:
        lr = args.learning_rate
    tx = optax.adam(lr)
    if args.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(args.grad_clip), tx)
    state = create_train_state(
        jax.random.PRNGKey(args.seed), sg,
        (kp0, kp1, (args.height, args.width), (args.height, args.width)),
        tx=tx, init_kwargs={"train": True},
    )
    if args.init_weights:
        from image_matching_tpu.utils.weights import load_npz_into

        loaded = load_npz_into(
            {"params": state.params, "batch_stats": state.batch_stats},
            args.init_weights,
        )
        state = state.replace(
            params=loaded["params"], batch_stats=loaded["batch_stats"]
        )
        log.info("warm-started SuperGlue from %s", args.init_weights)
    ckpt = CheckpointManager(f"{args.run_dir}/checkpoints")
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        log.info("resumed from step %d", int(state.step))
    # replicate across the mesh (restore may place arrays on one device)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))

    step_fn = make_superglue_train_step(sg, sp, sp_vars, cfg)

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(f"{args.run_dir}/logdir")
    except ImportError:
        pass

    key = jax.random.PRNGKey(args.seed + 7)
    try:
        for epoch in range(args.epochs):
            losses = []  # device scalars; read back only at log points
            t0 = time.perf_counter()
            for i in range(args.steps_per_epoch):
                key, k = jax.random.split(key)
                host = next(data_iter)
                batch = shard_batch(mesh, {"image": jnp.asarray(host["image"])})
                state, metrics = step_fn(state, batch, k)
                losses.append(metrics["loss"])
                # one readback per interval — per-step float() through the
                # TPU relay serialises the pipeline
                if writer and (i + 1) % args.log_interval == 0:
                    recent = float(np.mean(
                        [float(x) for x in losses[-args.log_interval:]]
                    ))
                    step = int(state.step)
                    writer.add_scalar("train/Mean_Loss", recent, step)
                    m = {k_: float(v) for k_, v in metrics.items()
                         if k_ != "loss"}
                    for k_, v in m.items():
                        writer.add_scalar(f"train/{k_}", v, step)
                    rate = (i + 1) / (time.perf_counter() - t0)
                    log.info("epoch %d step %d: loss %.4f (%.1f it/s) %s",
                             epoch, step, recent, rate, m)
            log.info(
                "epoch %d: mean loss %.4f (%.1f steps/s)",
                epoch, float(np.mean([float(x) for x in losses])),
                args.steps_per_epoch / (time.perf_counter() - t0),
            )
            ckpt.save(state)
    except KeyboardInterrupt:
        log.info("interrupted — saving checkpoint")
    ckpt.save(state, wait=True)


if __name__ == "__main__":
    main()
