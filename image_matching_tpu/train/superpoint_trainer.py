"""SuperPoint training step: detector BCE ×2 + sparse descriptor loss.

Parity with `Train_model_heatmap.train_val_sample`
(Train_model_heatmap.py:83-314): forward on the image and its warped
pair, detector loss on both with valid masks, sparse descriptor loss
between the two coarse maps through the pair homography, total =
loss_det + loss_det_warp + lambda_loss · loss_desc, Adam update. One
jitted, grad-through, batch-parallel XLA program instead of the
reference's per-sample host loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from image_matching_tpu.losses.descriptor import sparse_descriptor_loss
from image_matching_tpu.losses.detector import detector_loss
from image_matching_tpu.train.state import TrainState


class SuperPointLossConfig(NamedTuple):
    """Defaults mirror superpoint_allss_train_heatmap.yaml:59-77."""

    lambda_loss: float = 1.0
    num_matching_attempts: int = 1000
    num_masked_non_matches_per_match: int = 100
    lamda_d: float = 1.0
    margin_neg: float = 0.2
    cell_size: int = 8


def superpoint_loss_fn(
    params,
    batch_stats,
    model,
    batch: dict,
    key: jax.Array,
    cfg: SuperPointLossConfig,
    train: bool = True,
):
    """batch: image, labels_2d, valid_mask (B,H,W,1); warped_image,
    warped_labels, warped_valid_mask; homographies (B,3,3) img→warped."""
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    mutable = ["batch_stats"] if (train and batch_stats is not None) else False
    out, new_model_state = (
        model.apply(variables, batch["image"], train=True, mutable=mutable)
        if mutable
        else (model.apply(variables, batch["image"]), {})
    )
    if mutable:
        out_warp, new_model_state = model.apply(
            {"params": params, "batch_stats": new_model_state["batch_stats"]},
            batch["warped_image"],
            train=True,
            mutable=mutable,
        )
    else:
        out_warp = model.apply(variables, batch["warped_image"])

    loss_det = detector_loss(
        out["semi"], batch["labels_2d"], batch["valid_mask"], cfg.cell_size
    )
    loss_det_warp = detector_loss(
        out_warp["semi"], batch["warped_labels"], batch["warped_valid_mask"],
        cfg.cell_size,
    )
    loss_desc, pos, neg = sparse_descriptor_loss(
        key,
        out["desc_map"],
        out_warp["desc_map"],
        batch["homographies"],
        num_matching_attempts=cfg.num_matching_attempts,
        num_masked_non_matches_per_match=cfg.num_masked_non_matches_per_match,
        lamda_d=cfg.lamda_d,
        margin_neg=cfg.margin_neg,
        cell_size=cfg.cell_size,
    )
    total = loss_det + loss_det_warp + cfg.lambda_loss * loss_desc
    metrics = {
        "loss": total,
        "loss_det": loss_det,
        "loss_det_warp": loss_det_warp,
        "loss_desc": loss_desc,
        "positive_dist": pos,
        "negative_dist": neg,
    }
    new_bs = (
        new_model_state.get("batch_stats") if mutable else batch_stats
    )
    return total, (metrics, new_bs)


def make_superpoint_train_step(
    model, cfg: SuperPointLossConfig = SuperPointLossConfig(), donate: bool = True
):
    """Build the jitted `(state, batch, key) -> (state, metrics)` step."""

    def step(state: TrainState, batch: dict, key: jax.Array):
        grad_fn = jax.value_and_grad(superpoint_loss_fn, has_aux=True)
        (loss, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, model, batch, key, cfg, True
        )
        # failure guard: skip the update on a non-finite loss (a bad batch
        # must not poison the params — the reference has no such guard,
        # SURVEY.md §5 "failure detection")
        ok = jnp.isfinite(loss)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_state, state
        )
        metrics["skipped_nonfinite"] = (~ok).astype(jnp.int32)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_superpoint_eval_step(model, cfg: SuperPointLossConfig = SuperPointLossConfig()):
    def step(state: TrainState, batch: dict, key: jax.Array):
        _, (metrics, _) = superpoint_loss_fn(
            state.params, state.batch_stats, model, batch, key, cfg, False
        )
        return metrics

    return jax.jit(step)
