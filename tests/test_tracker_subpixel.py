"""PointTracker and subpixel-loss tests."""
import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.losses.subpixel import subpixel_loss, subpixel_loss_no_argmax
from image_matching_tpu.models.tracker import (
    get_tracks,
    track_lengths,
    tracker_init,
    tracker_update,
)
from image_matching_tpu.structs import Keypoints


def make_frame(rng, k, d, xy=None, desc=None):
    xy = xy if xy is not None else rng.uniform(0, 100, (k, 2)).astype(np.float32)
    if desc is None:
        desc = rng.normal(size=(k, d)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
    return Keypoints(
        xy=jnp.asarray(xy),
        score=jnp.ones((k,)) * 0.5,
        mask=jnp.ones((k,), bool),
        desc=jnp.asarray(desc),
    )


class TestTracker:
    def test_tracks_persist_across_frames(self):
        rng = np.random.default_rng(0)
        k, d = 16, 32
        f0 = make_frame(rng, k, d)
        state = tracker_init(max_length=5, capacity=k, desc_dim=d)
        state = tracker_update(state, f0)
        ids0 = np.asarray(state.track_ids[-1])
        assert (ids0 >= 0).all() and len(set(ids0.tolist())) == k

        # same descriptors, slightly moved points -> same track ids
        f1 = make_frame(
            rng, k, d,
            xy=np.asarray(f0.xy) + 1.0,
            desc=np.asarray(f0.desc),
        )
        state = tracker_update(state, f1)
        ids1 = np.asarray(state.track_ids[-1])
        np.testing.assert_array_equal(ids0, ids1)
        assert (np.asarray(track_lengths(state))[:k] >= 2).all()

    def test_new_points_get_new_ids(self):
        rng = np.random.default_rng(1)
        k, d = 8, 16
        f0 = make_frame(rng, k, d)
        state = tracker_init(4, k, d)
        state = tracker_update(state, f0)
        f1 = make_frame(rng, k, d)  # unrelated descriptors
        state = tracker_update(state, f1, max_dist=0.3)
        ids0 = set(np.asarray(state.track_ids[-2]).tolist())
        ids1 = set(np.asarray(state.track_ids[-1]).tolist())
        assert ids0.isdisjoint(ids1)

    def test_get_tracks_extraction(self):
        rng = np.random.default_rng(2)
        k, d = 6, 16
        f0 = make_frame(rng, k, d)
        state = tracker_init(4, k, d)
        state = tracker_update(state, f0)
        for step in range(3):
            f = make_frame(
                rng, k, d,
                xy=np.asarray(f0.xy) + step,
                desc=np.asarray(f0.desc),
            )
            state = tracker_update(state, f)
        tracks = get_tracks(state, min_length=3)
        assert len(tracks) == k
        tid, obs = tracks[0]
        assert len(obs) >= 3

    def test_scan_over_video(self):
        """The whole tracker loop runs inside lax.scan (device-resident)."""
        rng = np.random.default_rng(3)
        k, d, t = 8, 16, 5
        base = make_frame(rng, k, d)
        frames_xy = jnp.asarray(
            np.stack([np.asarray(base.xy) + i for i in range(t)])
        )

        def step(state, xy):
            f = base.replace(xy=xy)
            state = tracker_update(state, f)
            return state, state.track_ids[-1]

        init = tracker_update(tracker_init(4, k, d), base)
        final, ids = jax.lax.scan(step, init, frames_xy)
        assert (np.asarray(ids) == np.asarray(ids[0])[None]).all()


class TestSubpixelLoss:
    def test_zero_when_argmax_matches_residual(self):
        # heatmap gaussian centred at (16.5, 12.0): residual (0.5, 0.0)
        ys, xs = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        heat = np.exp(-((xs - 16.5) ** 2 + (ys - 12.0) ** 2) / 2.0).astype(np.float32)
        xy = jnp.array([[[16.0, 12.0]]])
        res = jnp.array([[[0.5, 0.0]]])
        mask = jnp.ones((1, 1), bool)
        loss = subpixel_loss(xy, res, mask, jnp.asarray(heat)[None, ..., None], 5)
        assert float(loss) < 0.15

    def test_larger_when_residual_wrong(self):
        ys, xs = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        heat = np.exp(-((xs - 16.5) ** 2 + (ys - 12.0) ** 2) / 2.0).astype(np.float32)
        xy = jnp.array([[[16.0, 12.0]]])
        mask = jnp.ones((1, 1), bool)
        good = subpixel_loss(
            xy, jnp.array([[[0.5, 0.0]]]), mask, jnp.asarray(heat)[None, ..., None], 5
        )
        bad = subpixel_loss(
            xy, jnp.array([[[-1.5, 1.0]]]), mask, jnp.asarray(heat)[None, ..., None], 5
        )
        assert float(bad) > float(good) + 0.5

    def test_no_argmax_variant(self):
        res_map = jnp.zeros((1, 16, 16, 2)).at[0, 5, 7].set(jnp.array([0.3, -0.2]))
        xy = jnp.array([[[7.0, 5.0]]])
        gt = jnp.array([[[0.3, -0.2]]])
        mask = jnp.ones((1, 1), bool)
        loss = subpixel_loss_no_argmax(xy, gt, mask, res_map)
        assert float(loss) < 1e-6
        loss2 = subpixel_loss_no_argmax(xy, gt + 1.0, mask, res_map)
        assert float(loss2) > 1.0
