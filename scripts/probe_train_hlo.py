"""Measure HLO sizes of the SuperPoint train step and its pieces (CPU).

The TPU train-step compile stalls through the relay (ROADMAP item 2);
this probe localises which sub-graph carries the instruction count so
the shrink effort targets the right place.
"""
import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from image_matching_tpu.data.pipeline import WarpedPairConfig, make_warped_pair_batch
from image_matching_tpu.models.superpoint import SuperPointBN
from image_matching_tpu.train import (
    SuperPointLossConfig,
    create_train_state,
    make_superpoint_train_step,
)

B, H, W, K = 8, 240, 320, 256


def report(name, lowered):
    txt = lowered.as_text()
    n_stablehlo = txt.count("\n")
    compiled = lowered.compile()
    try:
        hlo = compiled.as_text()
        n_opt = hlo.count("\n")
    except Exception:
        n_opt = -1
    print(f"{name:32s} stablehlo_lines={n_stablehlo:8d} optimized_lines={n_opt:8d}")
    return n_stablehlo, n_opt


def main():
    model = SuperPointBN(descriptor_dim=128, dtype=jnp.bfloat16)
    example = jnp.zeros((1, H, W, 1))
    state = create_train_state(
        jax.random.PRNGKey(0), model, (example,),
        tx=optax.adam(1e-4), init_kwargs={"train": True},
    )
    key = jax.random.PRNGKey(1)
    images = jnp.zeros((B, H, W, 1))
    pts = jnp.zeros((B, K, 2))
    mask = jnp.zeros((B, K), bool)

    cfg = WarpedPairConfig()
    lowered = jax.jit(
        make_warped_pair_batch, static_argnames=("cfg", "augment")
    ).lower(key, images, pts, mask, cfg, True)
    report("make_warped_pair_batch", lowered)
    batch = make_warped_pair_batch(key, images, pts, mask, cfg, True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    step = make_superpoint_train_step(model, SuperPointLossConfig(), donate=False)
    report("train_step(full)", step.lower(state, batch, key))

    # fwd-only loss
    from image_matching_tpu.train.superpoint_trainer import superpoint_loss_fn

    def fwd_only(params, bs, batch, key):
        return superpoint_loss_fn(params, bs, model, batch, key,
                                  SuperPointLossConfig(), True)

    report("loss_fwd_only", jax.jit(fwd_only).lower(
        state.params, state.batch_stats, batch, key))

    # grad only (no adam / guard)
    def grad_only(params, bs, batch, key):
        g = jax.grad(lambda p: superpoint_loss_fn(
            p, bs, model, batch, key, SuperPointLossConfig(), True)[0])(params)
        return g

    report("loss_fwd_bwd(no-opt)", jax.jit(grad_only).lower(
        state.params, state.batch_stats, batch, key))

    # detector-only loss
    def det_only(params, bs, batch):
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, batch["image"],
            train=True, mutable=["batch_stats"],
        )
        from image_matching_tpu.losses.detector import detector_loss
        return detector_loss(out["semi"], batch["labels_2d"],
                             batch["valid_mask"], 8)

    report("det_loss_fwd_bwd", jax.jit(
        lambda p, bs, b: jax.grad(lambda pp: det_only(pp, bs, b))(p)
    ).lower(state.params, state.batch_stats, batch))

    # descriptor-loss-only fwd+bwd
    from image_matching_tpu.losses.descriptor import sparse_descriptor_loss

    def desc_only(params, bs, batch, key):
        var = {"params": params, "batch_stats": bs}
        out = model.apply(var, batch["image"])
        outw = model.apply(var, batch["warped_image"])
        l, _, _ = sparse_descriptor_loss(
            key, out["desc_map"], outw["desc_map"], batch["homographies"])
        return l

    report("desc_loss_fwd_bwd", jax.jit(
        lambda p, bs, b, k: jax.grad(
            lambda pp: desc_only(pp, bs, b, k))(p)
    ).lower(state.params, state.batch_stats, batch, key))


if __name__ == "__main__":
    main()
