"""Training/eval metrics.

Parity: `precisionRecall_torch` (utils/utils.py:521-532) and the NMS-based
precision/recall the trainer logs each tensorboard interval
(Train_model_frontend.py:504-599), plus registration-quality metrics for
the eval pipelines (reprojection error is in registration.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from image_matching_tpu.geometry.labels import flatten_detection
from image_matching_tpu.ops.nms import simple_nms


def precision_recall(pred: jax.Array, labels: jax.Array) -> dict:
    """Binary precision/recall with the reference's 1e-6 smoothing."""
    offset = 1e-6
    pred = pred.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    tp = jnp.sum(pred * labels)
    return {
        "precision": tp / (jnp.sum(pred) + offset),
        "recall": tp / (jnp.sum(labels) + offset),
    }


def detector_precision_recall(
    semi: jax.Array,
    labels_2d: jax.Array,
    detection_threshold: float = 0.015,
    nms_radius: int = 4,
) -> dict:
    """NMS'd detections vs pseudo-labels, as the trainers log
    (Train_model_heatmap.py:302-307)."""
    heat = flatten_detection(semi)[..., 0]
    nms = simple_nms(heat, nms_radius)
    pred = (nms > detection_threshold).astype(jnp.float32)
    return precision_recall(pred, labels_2d[..., 0] > 0.5)


def matching_precision_recall(
    matches0: jax.Array, gt0: jax.Array, mask0: jax.Array, n1: int
) -> dict:
    """Match-level PR against a GT assignment (dustbin index = n1)."""
    pred_match = matches0 >= 0
    gt_match = (gt0 < n1) & mask0
    correct = pred_match & gt_match & (matches0 == gt0)
    offset = 1e-6
    return {
        "match_precision": jnp.sum(correct) / (jnp.sum(pred_match & mask0) + offset),
        "match_recall": jnp.sum(correct) / (jnp.sum(gt_match) + offset),
    }
