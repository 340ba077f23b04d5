"""Homographic-adaptation pseudo-label export — one jitted program.

Parity: `superpoint_export_pseudo.py:18-120` + `SuperPointFrontend_torch`
(model_wrap.py:264-351) + `combine_heatmap` (utils/utils.py:507-519):
per image, run the detector on `num_homographies` random warps (the warp
stack IS the batch dimension — a perfect data-parallel workload), warp
the heatmaps back, masked-average, NMS, top-k (1200), optional soft-argmax
subpixel refinement. The reference splits this across dataset workers,
DataParallel GPUs and host numpy NMS; here image→Keypoints is a single
XLA program that also vmaps over a batch of images and shards over a
`data` mesh axis.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from image_matching_tpu.geometry.homography import (
    HomographyConfig,
    invert_homography,
    sample_homography_batch,
)
from image_matching_tpu.geometry.labels import combine_heatmaps, flatten_detection
from image_matching_tpu.geometry.warp import compute_valid_mask, warp_image
from image_matching_tpu.ops.detect import detect_keypoints
from image_matching_tpu.ops.sampling import refine_keypoints_subpixel
from image_matching_tpu.structs import Keypoints


class ExportConfig(NamedTuple):
    """Defaults mirror magicpoint_allss_export.yaml:14-44."""

    num_homographies: int = 50
    top_k: int = 1200
    detection_threshold: float = 0.015
    nms_radius: int = 4
    subpixel: bool = True
    subpixel_patch: int = 5
    # suppress pixels observed by fewer than this many warped views
    # (homography_adaptation.filter_counts, yaml:16)
    filter_counts: int = 0
    homography: HomographyConfig = HomographyConfig(
        scaling_amplitude=0.2,
        perspective_amplitude_x=0.2,
        perspective_amplitude_y=0.2,
        patch_ratio=0.85,
        allow_artifacts=True,
    )


def homographic_adaptation_heatmap(
    key: jax.Array,
    apply_fn: Callable[[jax.Array], jax.Array],
    image: jax.Array,
    cfg: ExportConfig = ExportConfig(),
) -> jax.Array:
    """Aggregated heatmap for one image (H, W, 1).

    `apply_fn`: batched images (N, H, W, 1) → semi logits (N, Hc, Wc, 65).
    The first warp is the identity (the reference always includes the
    un-warped view via its aggregation of the original heatmap).
    """
    h, w = image.shape[0], image.shape[1]
    n = cfg.num_homographies
    hs = sample_homography_batch(key, n, h, w, cfg.homography)
    hs = hs.at[0].set(jnp.eye(3))
    h_inv = invert_homography(hs)

    views = warp_image(jnp.broadcast_to(image, (n, h, w, image.shape[-1])), h_inv)
    masks = compute_valid_mask(h_inv, h, w)[..., None]

    semi = apply_fn(views)
    heatmaps = flatten_detection(semi)
    agg = combine_heatmaps(heatmaps, hs, masks)
    if cfg.filter_counts > 0:
        counts = jnp.sum(warp_image(masks, hs, mode="nearest"), axis=0)
        agg = jnp.where(counts >= cfg.filter_counts, agg, 0.0)
    return agg


def export_pseudo_labels(
    key: jax.Array,
    apply_fn: Callable[[jax.Array], jax.Array],
    images: jax.Array,
    cfg: ExportConfig = ExportConfig(),
) -> Keypoints:
    """Batch of images (B, H, W, 1) → pseudo-label Keypoints (B, top_k)."""
    keys = jax.random.split(key, images.shape[0])
    heat = jax.vmap(
        lambda k, im: homographic_adaptation_heatmap(k, apply_fn, im, cfg)
    )(keys, images)
    kpts = detect_keypoints(
        heat,
        max_keypoints=cfg.top_k,
        threshold=cfg.detection_threshold,
        nms_radius=cfg.nms_radius,
    )
    if cfg.subpixel:
        xy = refine_keypoints_subpixel(
            heat[..., 0], kpts.xy, cfg.subpixel_patch
        )
        kpts = kpts.replace(xy=jnp.where(kpts.mask[..., None], xy, kpts.xy))
    return kpts


def make_export_fn(model, variables, cfg: ExportConfig = ExportConfig()):
    """Bind a SuperPoint model into a jitted export function."""

    def apply_fn(views):
        return model.apply(variables, views)["semi"]

    @jax.jit
    def export(key, images):
        return export_pseudo_labels(key, apply_fn, images, cfg)

    return export
