"""AOT-compile one piece of the SuperPoint training program on the TPU.

Used to localise the round-1 train-step compile stall (ROADMAP item 2):
each invocation compiles a single sub-program and prints the wall time.
Run via scripts/probe_tpu_compile.sh which sequences the pieces under
`timeout` so a hang cannot block the rest.

Usage: python scripts/probe_tpu_compile.py <piece>
pieces: matmul, sp_fwd, det_bwd, desc_bwd, pipeline, train_step, train_step_b32
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from image_matching_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, K = 8, 240, 320, 256


def build(piece):
    from image_matching_tpu.data.pipeline import (
        WarpedPairConfig,
        make_warped_pair_batch,
    )
    from image_matching_tpu.losses.descriptor import sparse_descriptor_loss
    from image_matching_tpu.losses.detector import detector_loss
    from image_matching_tpu.models.superpoint import SuperPointBN
    from image_matching_tpu.train import (
        SuperPointLossConfig,
        create_train_state,
        make_superpoint_train_step,
    )

    b = 32 if piece.endswith("_b32") else B
    model = SuperPointBN(descriptor_dim=128, dtype=jnp.bfloat16)
    example = jnp.zeros((1, H, W, 1))
    state = create_train_state(
        jax.random.PRNGKey(0), model, (example,),
        tx=optax.adam(1e-4), init_kwargs={"train": True},
    )
    key = jax.random.PRNGKey(1)
    images = jnp.zeros((b, H, W, 1))
    pts = jnp.zeros((b, K, 2))
    mask = jnp.zeros((b, K), bool)
    cfg = WarpedPairConfig()

    if piece == "matmul":
        x = jnp.zeros((1024, 1024), jnp.bfloat16)
        return jax.jit(lambda a: a @ a).lower(x)
    if piece == "pipeline" or piece == "pipeline_b32":
        return jax.jit(
            make_warped_pair_batch, static_argnames=("cfg", "augment")
        ).lower(key, images, pts, mask, cfg, True)

    # batch placeholder (abstract eval only — no host data needed)
    batch = jax.eval_shape(
        lambda k, i, p, m: make_warped_pair_batch(k, i, p, m, cfg, True),
        key, images, pts, mask,
    )
    batch = {k_: jnp.zeros(v.shape, v.dtype) for k_, v in batch.items()}

    if piece == "sp_fwd":
        return jax.jit(
            lambda p, bs, x: model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
            )
        ).lower(state.params, state.batch_stats, batch["image"])
    if piece == "det_bwd":
        def det_only(params, bs, batch):
            out, _ = model.apply(
                {"params": params, "batch_stats": bs}, batch["image"],
                train=True, mutable=["batch_stats"],
            )
            return detector_loss(out["semi"], batch["labels_2d"],
                                 batch["valid_mask"], 8)
        return jax.jit(
            lambda p, bs, bt: jax.grad(lambda pp: det_only(pp, bs, bt))(p)
        ).lower(state.params, state.batch_stats, batch)
    if piece == "desc_bwd":
        def desc_only(params, bs, batch, key):
            var = {"params": params, "batch_stats": bs}
            out = model.apply(var, batch["image"])
            outw = model.apply(var, batch["warped_image"])
            l, _, _ = sparse_descriptor_loss(
                key, out["desc_map"], outw["desc_map"], batch["homographies"])
            return l
        return jax.jit(
            lambda p, bs, bt, k: jax.grad(
                lambda pp: desc_only(pp, bs, bt, k))(p)
        ).lower(state.params, state.batch_stats, batch, key)
    if piece in ("train_step", "train_step_b32"):
        step = make_superpoint_train_step(
            model, SuperPointLossConfig(), donate=False)
        return step.lower(state, batch, key)
    raise SystemExit(f"unknown piece {piece}")


def main():
    piece = sys.argv[1]
    dev = jax.devices()[0]
    print(f"[{piece}] device={dev.platform}:{dev.device_kind}", flush=True)
    t0 = time.perf_counter()
    lowered = build(piece)
    t1 = time.perf_counter()
    print(f"[{piece}] lowered in {t1-t0:.1f}s", flush=True)
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"[{piece}] COMPILED in {t2-t1:.1f}s "
          f"(flops={compiled.cost_analysis().get('flops', 0):.3g})", flush=True)


if __name__ == "__main__":
    main()
