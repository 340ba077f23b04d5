"""Data pipeline, photometric aug, HA export, checkpoint, metrics tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from image_matching_tpu.data import (
    PhotometricConfig,
    SyntheticShapesDataset,
    WarpedPairConfig,
    make_warped_pair_batch,
    photometric_augment,
)
from image_matching_tpu.export import ExportConfig, make_export_fn
from image_matching_tpu.models.superpoint import SuperPointBN
from image_matching_tpu.train.checkpoint import CheckpointManager
from image_matching_tpu.train.metrics import (
    detector_precision_recall,
    precision_recall,
)


class TestPhotometric:
    def test_shapes_and_range(self):
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(0, 1, (4, 48, 64, 1)).astype(np.float32))
        out = photometric_augment(jax.random.PRNGKey(0), imgs)
        assert out.shape == imgs.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_changes_image_but_batch_independent(self):
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(
            np.tile(rng.uniform(0.2, 0.8, (1, 32, 32, 1)), (2, 1, 1, 1)).astype(
                np.float32
            )
        )
        out = np.asarray(photometric_augment(jax.random.PRNGKey(1), imgs))
        assert not np.allclose(out[0], np.asarray(imgs[0]))
        assert not np.allclose(out[0], out[1])  # per-sample randomness

    def test_disable(self):
        imgs = jnp.ones((1, 16, 16, 1)) * 0.5
        out = photometric_augment(
            jax.random.PRNGKey(0), imgs, PhotometricConfig(enable=False)
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))


class TestWarpedPairBatch:
    def test_full_batch_construction(self):
        rng = np.random.default_rng(2)
        imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
        pts = jnp.asarray(rng.uniform(8, 56, (2, 16, 2)).astype(np.float32))
        mask = jnp.ones((2, 16), bool)
        batch = make_warped_pair_batch(jax.random.PRNGKey(0), imgs, pts, mask)
        for k in (
            "image", "labels_2d", "valid_mask",
            "warped_image", "warped_labels", "warped_valid_mask",
        ):
            assert batch[k].shape == (2, 64, 64, 1), k
        assert batch["homographies"].shape == (2, 3, 3)
        assert float(batch["labels_2d"].max()) > 0
        assert float(batch["warped_labels"].max()) > 0

    def test_labels_follow_homography(self):
        """The warped label peak must sit at warp_points(label)."""
        from image_matching_tpu.geometry.homography import warp_points

        imgs = jnp.zeros((1, 64, 64, 1))
        pts = jnp.asarray(np.array([[[30.0, 30.0]]], np.float32))
        mask = jnp.ones((1, 1), bool)
        cfg = WarpedPairConfig(
            photometric=PhotometricConfig(enable=False), gaussian_label_sigma=0.0
        )
        batch = make_warped_pair_batch(
            jax.random.PRNGKey(3), imgs, pts, mask, cfg, augment=False
        )
        wxy = np.asarray(warp_points(pts, batch["homographies"]))[0, 0]
        wl = np.asarray(batch["warped_labels"][0, :, :, 0])
        if 1 <= wxy[0] <= 62 and 1 <= wxy[1] <= 62:
            peak = np.unravel_index(wl.argmax(), wl.shape)
            assert abs(peak[1] - wxy[0]) <= 1 and abs(peak[0] - wxy[1]) <= 1


class TestSyntheticShapes:
    def test_batches(self):
        ds = SyntheticShapesDataset(height=120, width=160, max_points=64)
        batch = next(ds.batches(3))
        assert batch["image"].shape == (3, 120, 160, 1)
        assert batch["points"].shape == (3, 64, 2)
        assert batch["points_mask"].any()


class TestExport:
    def test_ha_export_shapes_and_mask(self):
        model = SuperPointBN(descriptor_dim=32)
        rng = np.random.default_rng(4)
        imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), imgs)
        cfg = ExportConfig(num_homographies=6, top_k=128, detection_threshold=0.0)
        export = make_export_fn(model, variables, cfg)
        kpts = export(jax.random.PRNGKey(1), imgs)
        assert kpts.xy.shape == (2, 128, 2)
        assert np.isfinite(np.asarray(kpts.xy)).all()
        # subpixel coords stay inside the image
        xy = np.asarray(kpts.xy)[np.asarray(kpts.mask)]
        if len(xy):
            assert (xy >= -1).all() and (xy[:, 0] < 65).all() and (xy[:, 1] < 65).all()


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        model = SuperPointBN(descriptor_dim=16)
        img = jnp.zeros((1, 32, 32, 1))
        from image_matching_tpu.train import create_train_state

        state = create_train_state(
            jax.random.PRNGKey(0), model, (img,), tx=optax.adam(1e-3),
            init_kwargs={"train": True},
        )
        state = state.replace(step=state.step + 7)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(state, wait=True)
        assert mgr.latest_step() == 7

        state2 = create_train_state(
            jax.random.PRNGKey(1), model, (img,), tx=optax.adam(1e-3),
            init_kwargs={"train": True},
        )
        restored = mgr.restore(state2)
        assert int(restored.step) == 7
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        mgr.close()


class TestMetrics:
    def test_precision_recall_known(self):
        pred = jnp.asarray(np.array([[1, 1, 0, 0]], np.float32))
        lab = jnp.asarray(np.array([[1, 0, 1, 0]], np.float32))
        pr = precision_recall(pred, lab)
        np.testing.assert_allclose(float(pr["precision"]), 0.5, rtol=1e-4)
        np.testing.assert_allclose(float(pr["recall"]), 0.5, rtol=1e-4)

    def test_detector_pr_on_perfect_heatmap(self):
        lab = np.zeros((1, 16, 16, 1), np.float32)
        lab[0, 4, 4, 0] = 1.0
        lab[0, 12, 9, 0] = 1.0
        from image_matching_tpu.geometry.labels import labels_2d_to_3d

        semi = 25.0 * labels_2d_to_3d(jnp.asarray(lab), 8, True)
        pr = detector_precision_recall(semi, jnp.asarray(lab), 0.5)
        assert float(pr["precision"]) > 0.99
        assert float(pr["recall"]) > 0.99
