"""Trainer tests: jitted steps run, losses decrease when overfitting one batch."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from image_matching_tpu.geometry.homography import invert_homography
from image_matching_tpu.geometry.warp import compute_valid_mask, warp_image
from image_matching_tpu.models.superglue import SuperGlue
from image_matching_tpu.models.superpoint import SuperPointBN
from image_matching_tpu.train import (
    SuperPointLossConfig,
    create_train_state,
    make_superglue_train_step,
    make_superpoint_train_step,
)
from image_matching_tpu.train.superglue_trainer import SuperGluePairConfig


def synthetic_sp_batch(rng, b=2, h=64, w=64, n_kp=24):
    images = rng.uniform(0, 1, (b, h, w, 1)).astype(np.float32)
    labels = np.zeros((b, h, w, 1), np.float32)
    for bi in range(b):
        ys = rng.integers(8, h - 8, n_kp)
        xs = rng.integers(8, w - 8, n_kp)
        labels[bi, ys, xs, 0] = 1.0
    # warped pair by a known translation homography
    hs = np.broadcast_to(
        np.array([[1, 0, 8.0], [0, 1, 4.0], [0, 0, 1]], np.float32), (b, 3, 3)
    ).copy()
    h_inv = np.asarray(invert_homography(jnp.asarray(hs)))
    warped = np.asarray(warp_image(jnp.asarray(images), jnp.asarray(h_inv)))
    warped_labels = np.asarray(
        warp_image(jnp.asarray(labels), jnp.asarray(h_inv), mode="nearest")
    )
    wmask = np.asarray(compute_valid_mask(jnp.asarray(h_inv), h, w))[..., None]
    return {
        "image": jnp.asarray(images),
        "labels_2d": jnp.asarray(labels),
        "valid_mask": jnp.ones((b, h, w, 1)),
        "warped_image": jnp.asarray(warped),
        "warped_labels": jnp.asarray(warped_labels),
        "warped_valid_mask": jnp.asarray(wmask),
        "homographies": jnp.asarray(hs),
    }


class TestSuperPointTrainer:
    def test_loss_decreases_on_one_batch(self):
        model = SuperPointBN(descriptor_dim=32)
        rng = np.random.default_rng(0)
        batch = synthetic_sp_batch(rng)
        state = create_train_state(
            jax.random.PRNGKey(0), model, (batch["image"],),
            tx=optax.adam(1e-3), init_kwargs={"train": True},
        )
        cfg = SuperPointLossConfig(
            num_matching_attempts=64, num_masked_non_matches_per_match=8
        )
        step = make_superpoint_train_step(model, cfg, donate=False)
        key = jax.random.PRNGKey(1)
        losses = []
        for i in range(12):
            state, metrics = step(state, batch, key)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9
        assert int(state.step) == 12

    def test_batch_stats_updated(self):
        model = SuperPointBN(descriptor_dim=32)
        rng = np.random.default_rng(1)
        batch = synthetic_sp_batch(rng, b=1)
        state = create_train_state(
            jax.random.PRNGKey(0), model, (batch["image"],),
            init_kwargs={"train": True},
        )
        step = make_superpoint_train_step(
            model,
            SuperPointLossConfig(num_matching_attempts=32,
                                 num_masked_non_matches_per_match=4),
            donate=False,
        )
        new_state, _ = step(state, batch, jax.random.PRNGKey(2))
        old = jax.tree_util.tree_leaves(state.batch_stats)
        new = jax.tree_util.tree_leaves(new_state.batch_stats)
        assert any(not np.allclose(a, b) for a, b in zip(old, new))


class TestSuperGlueTrainer:
    def test_loss_decreases_on_one_batch(self):
        d = 32
        sp = SuperPointBN(descriptor_dim=d)
        img = jnp.zeros((1, 64, 64, 1))
        sp_vars = sp.init(jax.random.PRNGKey(0), img)

        sg = SuperGlue(
            descriptor_dim=d,
            keypoint_encoder=(32, d),
            gnn_layers=2,
            sinkhorn_iterations=15,
        )
        rng = np.random.default_rng(2)
        images = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 1)).astype(np.float32))

        cfg = SuperGluePairConfig(max_keypoints=48, keypoint_threshold=0.0)
        from image_matching_tpu.train.superglue_trainer import generate_pair

        kp0, kp1, gt0, gt1, _ = generate_pair(
            jax.random.PRNGKey(3), sp, sp_vars, images, cfg
        )
        state = create_train_state(
            jax.random.PRNGKey(4), sg,
            (kp0, kp1, (64, 64), (64, 64)),
            tx=optax.adam(1e-3), init_kwargs={"train": True},
        )
        step = make_superglue_train_step(sg, sp, sp_vars, cfg, donate=False)
        key = jax.random.PRNGKey(5)
        batch = {"image": images}
        losses = []
        for _ in range(10):
            state, metrics = step(state, batch, key)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_gt_matches_generated(self):
        d = 32
        sp = SuperPointBN(descriptor_dim=d)
        img = jnp.zeros((1, 64, 64, 1))
        sp_vars = sp.init(jax.random.PRNGKey(0), img)
        rng = np.random.default_rng(3)
        images = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))
        from image_matching_tpu.train.superglue_trainer import generate_pair

        cfg = SuperGluePairConfig(max_keypoints=64, keypoint_threshold=0.0)
        kp0, kp1, gt0, gt1, warped = generate_pair(
            jax.random.PRNGKey(1), sp, sp_vars, images, cfg
        )
        assert gt0.shape == (1, 64)
        # indices within [0, K1] (K1 = dustbin)
        assert int(gt0.max()) <= 64 and int(gt0.min()) >= 0

    def test_photometric_pair_generation(self):
        """Photometric asymmetry corrupts the views but GT stays geometric
        and the step still trains (hard-regime SG training, VERDICT r2 #1)."""
        from image_matching_tpu.data.photometric import PhotometricConfig
        from image_matching_tpu.train.superglue_trainer import generate_pair

        d = 32
        sp = SuperPointBN(descriptor_dim=d)
        img = jnp.zeros((1, 64, 64, 1))
        sp_vars = sp.init(jax.random.PRNGKey(0), img)
        rng = np.random.default_rng(4)
        images = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32))

        cfg_plain = SuperGluePairConfig(max_keypoints=64, keypoint_threshold=0.0)
        cfg_photo = cfg_plain._replace(photometric=PhotometricConfig(enable=True))
        _, _, _, _, warped_plain = generate_pair(
            jax.random.PRNGKey(1), sp, sp_vars, images, cfg_plain
        )
        kp0, kp1, gt0, gt1, warped_photo = generate_pair(
            jax.random.PRNGKey(1), sp, sp_vars, images, cfg_photo
        )
        # same key => same homography; only the photometric layer differs
        assert float(jnp.abs(warped_photo - warped_plain).mean()) > 1e-3
        assert gt0.shape == (1, 64)
        assert int(gt0.max()) <= 64 and int(gt0.min()) >= 0
        # some real (non-dustbin) correspondences survive the corruption
        assert int(jnp.sum(gt0 < 64)) > 0
