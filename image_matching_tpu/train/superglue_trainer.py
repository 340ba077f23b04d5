"""SuperGlue training step with on-device pair generation.

The reference generates pairs by running SuperPoint *inside the torch
dataset's __getitem__* (GlueSparse.py:18,38-39 — flagged as a design
smell in SURVEY.md §2) and computes GT matches with scipy cdist on the
host (GlueSparse.py:63-82). Here the whole pipeline is one jitted step:

  sample homography → warp image on device → frozen SuperPoint on both
  views → GT assignment by mutual-NN of warped keypoints (< 3 px) →
  SuperGlue forward → NLL → Adam update of the SuperGlue params.

Defaults mirror superpoint_glue_train.py:24-40 (lr 1e-4, max 1024 kpts,
nms 4, threshold 0.005, sinkhorn 100 at train).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from image_matching_tpu.data.photometric import PhotometricConfig, photometric_augment
from image_matching_tpu.geometry.homography import (
    HomographyConfig,
    invert_homography,
    sample_homography_batch,
    warp_points,
)
from image_matching_tpu.geometry.warp import warp_image
from image_matching_tpu.losses.superglue_loss import make_gt_matches, superglue_nll_loss
from image_matching_tpu.models.superpoint import superpoint_postprocess
from image_matching_tpu.train.state import TrainState


class SuperGluePairConfig(NamedTuple):
    max_keypoints: int = 512
    keypoint_threshold: float = 0.005
    nms_radius: int = 4
    subpixel: bool = False  # match eval-time postprocess (cli/evaluate
    # runs subpixel=True; training on integer-grid positions while
    # evaluating on refined ones is a train/eval geometry mismatch)
    gt_dist_thresh: float = 3.0  # GlueSparse.py:70
    homography: HomographyConfig = HomographyConfig(
        patch_ratio=0.85, allow_artifacts=True
    )
    # photometric asymmetry between the two views: each view gets an
    # independent photometric corruption (brightness/contrast/noise/
    # shade, data/photometric.py) before detection, so SuperGlue learns
    # to match across the template-vs-source domain gap the reference's
    # real photographs have (utils/photometric.py:10-115 models it for
    # SuperPoint training; the reference's GlueSparse pair generator
    # omits it — one reason its self-trained SuperGlue underperformed,
    # README.md:150).
    photometric: PhotometricConfig = PhotometricConfig(enable=False)


def generate_pair(
    key: jax.Array,
    sp_model,
    sp_variables,
    images: jax.Array,
    cfg: SuperGluePairConfig,
):
    """images (B, H, W, 1) → (kpts0, kpts1, gt0, gt1, warped_images)."""
    b, h, w, _ = images.shape
    key, k_aug0, k_aug1 = jax.random.split(key, 3)
    hs = sample_homography_batch(key, b, h, w, cfg.homography)
    warped = warp_image(images, invert_homography(hs))
    if cfg.photometric.enable:
        # corrupt each view independently AFTER warping so detection and
        # description both see the photometric gap; GT stays geometric
        images = photometric_augment(k_aug0, images, cfg.photometric)
        warped = photometric_augment(k_aug1, warped, cfg.photometric)

    def detect(img):
        out = sp_model.apply(sp_variables, img)
        return superpoint_postprocess(
            out,
            max_keypoints=cfg.max_keypoints,
            threshold=cfg.keypoint_threshold,
            nms_radius=cfg.nms_radius,
            subpixel=cfg.subpixel,
        )

    kp0 = jax.lax.stop_gradient(detect(images))
    kp1 = jax.lax.stop_gradient(detect(warped))
    xy0_in1 = warp_points(kp0.xy, hs)
    gt0, gt1 = make_gt_matches(
        xy0_in1, kp1.xy, kp0.mask, kp1.mask, cfg.gt_dist_thresh
    )
    return kp0, kp1, gt0, gt1, warped


def make_superglue_train_step(
    sg_model,
    sp_model,
    sp_variables,
    cfg: SuperGluePairConfig = SuperGluePairConfig(),
    donate: bool = True,
):
    """Build the jitted `(state, batch, key) -> (state, metrics)` step.
    `state` holds SuperGlue variables; SuperPoint stays frozen."""

    def loss_fn(params, batch_stats, kp0, kp1, gt0, gt1, shape):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if batch_stats is not None else False
        if mutable:
            out, new_state = sg_model.apply(
                variables, kp0, kp1, shape, shape, train=True, mutable=mutable
            )
            new_bs = new_state["batch_stats"]
        else:
            out = sg_model.apply(variables, kp0, kp1, shape, shape, train=True)
            new_bs = None
        loss = superglue_nll_loss(
            out["log_coupling"], gt0, gt1, kp0.mask, kp1.mask
        )
        n_gt = jnp.sum(gt0 < kp1.mask.shape[-1])
        n_pred = jnp.sum(out["matches0"] >= 0)
        from image_matching_tpu.train.metrics import matching_precision_recall

        pr = matching_precision_recall(
            out["matches0"], gt0, kp0.mask, kp1.mask.shape[-1]
        )
        metrics = {"loss": loss, "gt_matches": n_gt, "pred_matches": n_pred}
        metrics.update(pr)
        return loss, (metrics, new_bs)

    def step(state: TrainState, batch: dict, key: jax.Array):
        images = batch["image"]
        shape = (images.shape[1], images.shape[2])
        kp0, kp1, gt0, gt1, _ = generate_pair(
            key, sp_model, sp_variables, images, cfg
        )
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, kp0, kp1, gt0, gt1, shape
        )
        # skip-update guard on non-finite loss (see superpoint_trainer)
        ok = jnp.isfinite(loss)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_state, state
        )
        metrics["skipped_nonfinite"] = (~ok).astype(jnp.int32)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
