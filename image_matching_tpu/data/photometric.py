"""On-device photometric augmentation — jittable, batched, no imgaug.

Parity with the reference's imgaug pipeline (utils/photometric.py:10-115
and the training config superpoint_allss_train_heatmap.yaml:16-29):
random brightness / contrast, additive gaussian + speckle noise, motion
blur, and the custom additive ellipse shade. The reference runs these
per-sample on dataloader worker CPUs; here the whole batch is augmented
on the TPU inside the input pipeline, keyed by a PRNG key.

Images are float32 in [0, 1], NHWC (the reference works in uint8
[0, 255]; parameter ranges are rescaled accordingly).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PhotometricConfig(NamedTuple):
    enable: bool = True
    max_abs_brightness: float = 50.0 / 255.0
    contrast_range: Tuple[float, float] = (0.5, 1.5)
    gaussian_noise_std_range: Tuple[float, float] = (0.0, 10.0 / 255.0)
    speckle_prob_range: Tuple[float, float] = (0.0, 0.0035)
    motion_blur_max_ksize: int = 3
    shade_transparency_range: Tuple[float, float] = (-0.5, 0.5)
    shade_kernel_size: int = 50  # blur radius of the shade mask
    shade_prob: float = 0.8


def _random_brightness(key, img, cfg):
    delta = jax.random.uniform(
        key, (), minval=-cfg.max_abs_brightness, maxval=cfg.max_abs_brightness
    )
    return img + delta


def _random_contrast(key, img, cfg):
    lo, hi = cfg.contrast_range
    s = jax.random.uniform(key, (), minval=lo, maxval=hi)
    mean = jnp.mean(img)
    return (img - mean) * s + mean


def _gaussian_noise(key, img, cfg):
    k1, k2 = jax.random.split(key)
    lo, hi = cfg.gaussian_noise_std_range
    std = jax.random.uniform(k1, (), minval=lo, maxval=hi)
    return img + std * jax.random.normal(k2, img.shape)


def _speckle_noise(key, img, cfg):
    k1, k2, k3 = jax.random.split(key, 3)
    lo, hi = cfg.speckle_prob_range
    prob = jax.random.uniform(k1, (), minval=lo, maxval=hi)
    u = jax.random.uniform(k2, img.shape)
    salt = jax.random.uniform(k3, img.shape) > 0.5
    img = jnp.where(u < prob, jnp.where(salt, 1.0, 0.0), img)
    return img


def _motion_kernels(ksize: int) -> jax.Array:
    """Line kernels at 4 orientations (h, v, two diagonals)."""
    k = ksize
    kernels = []
    horiz = jnp.zeros((k, k)).at[k // 2, :].set(1.0 / k)
    vert = jnp.zeros((k, k)).at[:, k // 2].set(1.0 / k)
    diag = jnp.eye(k) / k
    anti = jnp.flip(jnp.eye(k), 0) / k
    for m in (horiz, vert, diag, anti):
        kernels.append(m)
    return jnp.stack(kernels)  # (4, k, k)


def _motion_blur(key, img, cfg):
    k1, k2 = jax.random.split(key)
    ksize = cfg.motion_blur_max_ksize
    kernels = _motion_kernels(ksize)
    idx = jax.random.randint(k1, (), 0, kernels.shape[0])
    kern = kernels[idx]
    blurred = jax.lax.conv_general_dilated(
        img[None].transpose(0, 3, 1, 2),
        kern[None, None],
        (1, 1),
        "SAME",
    ).transpose(0, 2, 3, 1)[0]
    apply = jax.random.uniform(k2, ()) > 0.5
    return jnp.where(apply, blurred, img)


def _gaussian_blur_kernel(radius: int, sigma: float) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / jnp.sum(g)


def _additive_shade(key, img, cfg):
    """Random ellipse shading (`customizedTransform.additive_shade`,
    utils/photometric.py:81-115): draw a random ellipse, blur it, darken
    or brighten the region by a random transparency."""
    h, w = img.shape[0], img.shape[1]
    keys = jax.random.split(key, 7)
    cx = jax.random.uniform(keys[0], (), minval=0.0, maxval=float(w))
    cy = jax.random.uniform(keys[1], (), minval=0.0, maxval=float(h))
    ax = jax.random.uniform(keys[2], (), minval=w * 0.1, maxval=w * 0.5)
    ay = jax.random.uniform(keys[3], (), minval=h * 0.1, maxval=h * 0.5)
    angle = jax.random.uniform(keys[4], (), minval=0.0, maxval=jnp.pi)
    lo, hi = cfg.shade_transparency_range
    transparency = jax.random.uniform(keys[5], (), minval=lo, maxval=hi)

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    xr = (xs - cx) * ca + (ys - cy) * sa
    yr = -(xs - cx) * sa + (ys - cy) * ca
    mask = ((xr / ax) ** 2 + (yr / ay) ** 2 <= 1.0).astype(jnp.float32)

    # separable blur of the mask
    g = _gaussian_blur_kernel(cfg.shade_kernel_size // 2, cfg.shade_kernel_size / 6.0)
    m = mask[None, None]  # (1, 1, H, W)
    m = jax.lax.conv_general_dilated(m, g[None, None, :, None], (1, 1), "SAME")
    m = jax.lax.conv_general_dilated(m, g[None, None, None, :], (1, 1), "SAME")
    mask = m[0, 0][..., None]

    shaded = img * (1.0 + transparency * mask)
    apply = jax.random.uniform(keys[6], ()) < cfg.shade_prob
    return jnp.where(apply, shaded, img)


def _augment_one(key: jax.Array, img: jax.Array, cfg: PhotometricConfig):
    ops = (
        _random_brightness,
        _random_contrast,
        _gaussian_noise,
        _speckle_noise,
        _motion_blur,
        _additive_shade,
    )
    keys = jax.random.split(key, len(ops))
    for k, op in zip(keys, ops):
        img = op(k, img, cfg)
    return jnp.clip(img, 0.0, 1.0)


@partial(jax.jit, static_argnames=("cfg",))
def photometric_augment(
    key: jax.Array, images: jax.Array, cfg: PhotometricConfig = PhotometricConfig()
) -> jax.Array:
    """Augment a batch (B, H, W, C) with independent random parameters."""
    if not cfg.enable:
        return images
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, im: _augment_one(k, im, cfg))(keys, images)
