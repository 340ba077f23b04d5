"""Train SuperPoint (detector + descriptor) — the reference's
`superpoint_train_descriptor.py` + `Train_model_heatmap.train()` loop
(iter-driven with validation/checkpoint intervals, TB scalars, Ctrl-C
checkpoint) rebuilt around jitted steps and on-device batch construction.

Usage:
  python -m image_matching_tpu.cli.train_superpoint \
      --data_root datasets/ALLSS --labels Results/pseudo_labels \
      --run_dir Results/superpoint_128 --descriptor_dim 128
  # or bootstrap on synthetic shapes (no files needed):
  python -m image_matching_tpu.cli.train_superpoint --synthetic ...
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from image_matching_tpu.data.datasets import ALLSSDataset, SyntheticShapesDataset
from image_matching_tpu.data.pipeline import WarpedPairConfig, make_warped_pair_batch
from image_matching_tpu.models.superpoint import SuperPointBN
from image_matching_tpu.parallel import make_data_mesh, shard_batch
from image_matching_tpu.train import (
    SuperPointLossConfig,
    create_train_state,
    make_superpoint_train_step,
)
from image_matching_tpu.train.checkpoint import CheckpointManager
from image_matching_tpu.train.metrics import detector_precision_recall
from image_matching_tpu.train.superpoint_trainer import make_superpoint_eval_step
from image_matching_tpu.utils.logging import get_logger

log = get_logger("train_superpoint")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", default=None)
    p.add_argument("--labels", default=None, help="pseudo-label npz dir")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--run_dir", default="runs/superpoint")
    p.add_argument("--descriptor_dim", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--train_iter", type=int, default=100_000)
    p.add_argument("--validation_interval", type=int, default=2000)
    p.add_argument("--save_interval", type=int, default=2000)
    p.add_argument("--tensorboard_interval", type=int, default=200)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--native_loader", action="store_true",
                   help="decode images through the C++ threaded loader")
    p.add_argument("--host_data", action="store_true",
                   help="generate synthetic batches with the host cv2 "
                        "dataset instead of on device")
    p.add_argument("--cosine_decay_steps", type=int, default=0,
                   help="cosine-decay the lr to lr/10 over this many "
                        "steps (0 = constant, the reference's behavior)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init_weights", default=None,
                   help="warm-start params/batch_stats from a .npz weight "
                        "snapshot (the reference's pretrained+retrain=True, "
                        "Train_model_frontend.py:317-324); step resets to 0")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    from image_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args()
    mesh = make_data_mesh(args.batch_size)
    log.info("devices: %s", jax.devices())

    if args.synthetic or args.data_root is None:
        train_ds = SyntheticShapesDataset(args.height, args.width, seed=args.seed)
        val_ds = SyntheticShapesDataset(args.height, args.width, seed=args.seed + 1)
        train_iter = train_ds.batches(args.batch_size)
        val_iter = val_ds.batches(args.batch_size)
    else:
        train_ds = ALLSSDataset(
            args.data_root, "train", args.labels, resize=(args.height, args.width)
        )
        val_ds = ALLSSDataset(
            args.data_root, "val", args.labels, resize=(args.height, args.width)
        )
        train_iter = train_ds.batches(
            args.batch_size, seed=args.seed, native=args.native_loader
        )
        val_iter = val_ds.batches(args.batch_size, shuffle=False)

    model = SuperPointBN(descriptor_dim=args.descriptor_dim, dtype=jnp.bfloat16)
    example = jnp.zeros((1, args.height, args.width, 1))
    state = create_train_state(
        jax.random.PRNGKey(args.seed), model, (example,),
        tx=optax.adam(
            optax.cosine_decay_schedule(
                args.learning_rate, args.cosine_decay_steps, alpha=0.1
            )
            if args.cosine_decay_steps > 0
            else args.learning_rate
        ),
        init_kwargs={"train": True},
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
        log.info("warm-started from %s", args.init_weights)
    ckpt = CheckpointManager(f"{args.run_dir}/checkpoints")
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        log.info("resumed from step %d", int(state.step))
    # replicate across the mesh (restore may place arrays on one device)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))

    pair_cfg = WarpedPairConfig()
    loss_cfg = SuperPointLossConfig()
    train_step = make_superpoint_train_step(model, loss_cfg)
    eval_step = make_superpoint_eval_step(model, loss_cfg)

    from image_matching_tpu.geometry.labels import flatten_detection

    @jax.jit
    def diagnostics(variables, image, labels_2d):
        """One jitted program for the TB-interval forward + PR metrics —
        eager per-op dispatch through the TPU relay is pathologically
        slow, so nothing per-interval may run outside jit."""
        semi = model.apply(variables, image)["semi"]
        return flatten_detection(semi), detector_precision_recall(semi, labels_2d)

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(f"{args.run_dir}/logdir")
    except ImportError:
        pass

    key = jax.random.PRNGKey(args.seed + 100)

    device_data = (
        (args.synthetic or args.data_root is None) and not args.host_data
    )
    if device_data:
        # the whole batch — shapes, corners, warped pair, labels — is one
        # jitted program; the only per-step host→device traffic is the
        # PRNG key (data/synthetic_device.py)
        from functools import partial

        from image_matching_tpu.data.synthetic_device import synthetic_batch

        @partial(jax.jit, donate_argnums=())
        def synth_pair_batch(k):
            k1, k2 = jax.random.split(k)
            out = synthetic_batch(k1, args.batch_size, args.height, args.width)
            return make_warped_pair_batch(
                k2, out["image"], out["points"], out["points_mask"], pair_cfg
            )

        log.info("synthetic batches generated on device")

    def device_batch(host_batch, k):
        if device_data:
            return shard_batch(mesh, synth_pair_batch(k))
        images = jnp.asarray(host_batch["image"])
        pts = jnp.asarray(host_batch["points"])
        mask = jnp.asarray(host_batch["points_mask"])
        batch = make_warped_pair_batch(k, images, pts, mask, pair_cfg)
        return shard_batch(mesh, batch)

    def next_host(it):
        return None if device_data else next(it)

    t0 = time.perf_counter()
    # host-side step counter: `int(state.step)` per iteration is a
    # device→host readback — through the TPU relay that round-trip
    # serialises the loop (measured: it, not compute, capped throughput)
    step = int(state.step)
    start_step = step
    try:
        while step < args.train_iter:
            key, k_data, k_loss = jax.random.split(key, 3)
            batch = device_batch(next_host(train_iter), k_data)
            state, metrics = train_step(state, batch, k_loss)
            step += 1

            if step % args.tensorboard_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                _, pr = diagnostics(state.variables, batch["image"], batch["labels_2d"])
                m.update({k: float(v) for k, v in pr.items()})
                rate = (step - start_step) / (time.perf_counter() - t0 + 1e-9)
                log.info("step %d (%.1f it/s): %s", step, rate, m)
                if writer:
                    for k_, v in m.items():
                        writer.add_scalar(f"train/{k_}", v, step)

            if step % args.validation_interval == 0:
                key, k_data, k_loss = jax.random.split(key, 3)
                vbatch = device_batch(next_host(val_iter), k_data)
                vm = eval_step(state, vbatch, k_loss)
                log.info("val @%d: %s", step, {k: float(v) for k, v in vm.items()})
                if writer:
                    for k_, v in vm.items():
                        writer.add_scalar(f"val/{k_}", float(v), step)
                    # heatmap overlay + param histograms, the reference's
                    # TB diagnostics (Train_model_frontend.py:430-502)
                    from image_matching_tpu.utils.viz import heatmap_overlay

                    heat_all, _ = diagnostics(
                        state.variables, vbatch["image"], vbatch["labels_2d"]
                    )
                    heat = np.asarray(heat_all[0])
                    overlay = heatmap_overlay(np.asarray(vbatch["image"][0]), heat)
                    writer.add_image(
                        "val/heatmap_overlay", overlay[..., ::-1], step,
                        dataformats="HWC",
                    )
                    for pname, leaf in jax.tree_util.tree_leaves_with_path(
                        state.params
                    )[:8]:
                        label = "/".join(
                            getattr(x, "key", str(x)) for x in pname
                        )
                        writer.add_histogram(
                            f"params/{label}", np.asarray(leaf), step
                        )

            if step % args.save_interval == 0:
                ckpt.save(state)
    except KeyboardInterrupt:
        # Ctrl-C checkpoint, as superpoint_train_descriptor.py:48-53
        log.info("interrupted — saving checkpoint")
    ckpt.save(state, wait=True)
    log.info("done at step %d", int(state.step))


if __name__ == "__main__":
    main()
