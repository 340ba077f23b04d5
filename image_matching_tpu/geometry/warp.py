"""Image warping and valid masks — bilinear gather on device, no OpenCV.

Parity targets: `inv_warp_image_batch` (utils/utils.py:388-421, a
torch `grid_sample` over an H-warped normalized grid) and
`compute_valid_mask` (utils/utils.py:427-454, nearest-warped ones +
cv2 erosion). Here the warp is a plain bilinear gather in *pixel*
coordinates — XLA lowers the gathers efficiently and everything fuses —
and erosion is a same-size convolution with a disk kernel, so the whole
thing runs on the TPU instead of round-tripping to the host for cv2.

Images are NHWC. Out-of-bounds samples read as zero (matching
grid_sample's zero padding).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from image_matching_tpu.geometry.homography import warp_points


def _gather_pixel(img: jax.Array, ix: jax.Array, iy: jax.Array) -> jax.Array:
    """img: (H, W, C); ix, iy: (...) int32 -> (..., C), zero out of bounds."""
    h, w = img.shape[0], img.shape[1]
    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    vals = img[iyc, ixc]  # advanced indexing -> gather
    return vals * valid[..., None].astype(img.dtype)


def bilinear_sample(img: jax.Array, coords_xy: jax.Array) -> jax.Array:
    """Bilinear sample of one image at float pixel coords.

    Args:
      img: (H, W, C).
      coords_xy: (..., 2) float (x, y) pixel coordinates.

    Returns:
      (..., C) sampled values; zero where all 4 taps fall outside.
    """
    x = coords_xy[..., 0].astype(jnp.float32)
    y = coords_xy[..., 1].astype(jnp.float32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = (x - x0.astype(jnp.float32))[..., None]
    wy = (y - y0.astype(jnp.float32))[..., None]

    v00 = _gather_pixel(img, x0, y0)
    v01 = _gather_pixel(img, x1, y0)
    v10 = _gather_pixel(img, x0, y1)
    v11 = _gather_pixel(img, x1, y1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def nearest_sample(img: jax.Array, coords_xy: jax.Array) -> jax.Array:
    """Nearest-neighbour sample; same contract as `bilinear_sample`."""
    ix = jnp.round(coords_xy[..., 0]).astype(jnp.int32)
    iy = jnp.round(coords_xy[..., 1]).astype(jnp.int32)
    return _gather_pixel(img, ix, iy)


def _source_grid(h_inv: jax.Array, height: int, width: int) -> jax.Array:
    """Pixel coords in the source image for every destination pixel."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys], axis=-1).reshape(-1, 2)  # (H*W, 2) as (x, y)
    src = warp_points(grid, h_inv)
    return src.reshape(height, width, 2)


@partial(jax.jit, static_argnames=("mode",))
def warp_image(img: jax.Array, h_inv: jax.Array, mode: str = "bilinear") -> jax.Array:
    """Warp image(s) so that `out(p) = img(h_inv @ p)` (inverse warping).

    To warp an image *by* homography H (as `cv2.warpPerspective(img, H)`
    does), pass `h_inv = inv(H)`.

    Args:
      img: (H, W, C) or (B, H, W, C).
      h_inv: (3, 3) or (B, 3, 3) destination→source homography in pixel coords.
      mode: "bilinear" or "nearest".

    Returns: same shape as `img`.
    """
    sample = bilinear_sample if mode == "bilinear" else nearest_sample

    def one(im, hm):
        src = _source_grid(hm, im.shape[0], im.shape[1])
        return sample(im, src)

    if img.ndim == 3:
        return one(img, h_inv)
    if h_inv.ndim == 2:
        h_inv = jnp.broadcast_to(h_inv, (img.shape[0], 3, 3))
    return jax.vmap(one)(img, h_inv)


def disk_kernel(radius: int) -> jax.Array:
    """Disk structuring element, matching cv2.getStructuringElement(ELLIPSE,
    (2r, 2r)) used at utils/utils.py:449 closely enough for mask erosion."""
    r = radius
    ys, xs = jnp.meshgrid(jnp.arange(2 * r), jnp.arange(2 * r), indexing="ij")
    cy = cx = (2 * r - 1) / 2.0
    return (((ys - cy) ** 2 + (xs - cx) ** 2) <= r * r).astype(jnp.float32)


@partial(jax.jit, static_argnames=("radius",))
def erode_mask(mask: jax.Array, radius: int) -> jax.Array:
    """Binary erosion with a disk kernel via convolution (TPU-friendly).

    mask: (..., H, W) float/bool in {0, 1}. A pixel survives iff every
    kernel tap is 1 — i.e. conv(mask) == sum(kernel).
    """
    if radius <= 0:
        return mask
    k = disk_kernel(radius)
    ksum = jnp.sum(k)
    m = mask.astype(jnp.float32)
    batch_shape = m.shape[:-2]
    m4 = m.reshape((-1,) + m.shape[-2:])[:, None]  # (B, 1, H, W)
    out = jax.lax.conv_general_dilated(
        m4, k[None, None], window_strides=(1, 1), padding="SAME"
    )
    eroded = (out[:, 0] >= ksum - 0.5).astype(mask.dtype)
    return eroded.reshape(batch_shape + mask.shape[-2:])


@partial(jax.jit, static_argnames=("height", "width", "erosion_radius"))
def compute_valid_mask(
    h_inv: jax.Array, height: int, width: int, erosion_radius: int = 0
) -> jax.Array:
    """Mask of destination pixels whose source location lies inside the image.

    Computed analytically from the warped grid (no image warp needed),
    then eroded — equivalent to warping a ones-image with nearest
    interpolation as the reference does (utils/utils.py:427-454).

    h_inv: (3, 3) or (B, 3, 3). Returns (H, W) or (B, H, W) float32 in {0,1}.
    """

    def one(hm):
        src = _source_grid(hm, height, width)
        x, y = src[..., 0], src[..., 1]
        # nearest-sampling of a ones image is valid where round(p) is in-bounds
        inb = (
            (jnp.round(x) >= 0)
            & (jnp.round(x) <= width - 1)
            & (jnp.round(y) >= 0)
            & (jnp.round(y) <= height - 1)
        )
        return inb.astype(jnp.float32)

    mask = one(h_inv) if h_inv.ndim == 2 else jax.vmap(one)(h_inv)
    return erode_mask(mask, erosion_radius)
