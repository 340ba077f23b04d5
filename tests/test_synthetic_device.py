"""On-device synthetic-shapes generator: structural parity with the host
cv2 dataset (families, ranges, exact-corner GT)."""
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.data.synthetic_device import (
    synthetic_batch,
    synthetic_sample,
)


def test_batch_shapes_and_ranges():
    out = synthetic_batch(jax.random.PRNGKey(0), 16, 120, 160)
    assert out["image"].shape == (16, 120, 160, 1)
    assert out["points"].shape == (16, 64, 2)
    assert out["points_mask"].shape == (16, 64)
    img = np.asarray(out["image"])
    assert img.min() >= 0.0 and img.max() <= 1.0
    # every sample has some structure and some valid corners
    assert (np.asarray(out["points_mask"]).sum(-1) >= 2).all()
    assert (img.std(axis=(1, 2, 3)) > 0.01).all()


def test_corners_in_bounds():
    out = synthetic_batch(jax.random.PRNGKey(1), 32, 96, 128)
    pts = np.asarray(out["points"])
    mask = np.asarray(out["points_mask"])
    assert (pts[mask][:, 0] >= 0).all() and (pts[mask][:, 0] < 128).all()
    assert (pts[mask][:, 1] >= 0).all() and (pts[mask][:, 1] < 96).all()


def test_corners_sit_on_image_structure():
    """A valid corner must have local contrast: the 5x5 patch around it
    is not flat (it is a shape vertex / line end / cell corner)."""
    out = synthetic_batch(jax.random.PRNGKey(2), 8, 240, 320)
    img = np.asarray(out["image"])[..., 0]
    pts = np.asarray(out["points"])
    mask = np.asarray(out["points_mask"])
    checked = contrasty = 0
    for b in range(8):
        for p in range(pts.shape[1]):
            if not mask[b, p]:
                continue
            x, y = pts[b, p]
            xi, yi = int(round(x)), int(round(y))
            if not (3 <= xi < 317 and 3 <= yi < 237):
                continue
            patch = img[b, yi - 3:yi + 4, xi - 3:xi + 4]
            checked += 1
            contrasty += patch.std() > 1e-3
    assert checked > 20
    assert contrasty / checked > 0.95


def test_all_three_families_appear():
    kinds = set()
    for s in range(12):
        out = synthetic_sample(jax.random.PRNGKey(100 + s), 96, 128)
        n_valid = int(np.asarray(out["points_mask"]).sum())
        kinds.add(n_valid)
    # polygons ≤ 18, lines ≤ 14 (even), checkerboard ≥ 16 grid corners —
    # across 12 seeds we should see at least 3 distinct corner counts
    assert len(kinds) >= 3


def test_feeds_warped_pair_batch():
    """Composes with the on-device pair/label machinery used in training."""
    from image_matching_tpu.data.pipeline import (
        WarpedPairConfig,
        make_warped_pair_batch,
    )

    out = synthetic_batch(jax.random.PRNGKey(3), 4, 120, 160)
    batch = make_warped_pair_batch(
        jax.random.PRNGKey(4), out["image"], out["points"],
        out["points_mask"], WarpedPairConfig(),
    )
    for k, v in batch.items():
        assert np.isfinite(np.asarray(v, dtype=np.float32)).all(), k
