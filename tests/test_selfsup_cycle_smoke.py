"""End-to-end smoke of the self-supervised cycle plumbing at toy scale:
synthetic pretrain -> npz snapshot -> warm-start retrain -> HA pseudo-label
export from the npz. Mirrors scripts/selfsup_cycle.sh stage interfaces
(the reference's MagicPoint -> SuperPoint recipe, README.md:63-157) so a
stage-wiring regression fails here rather than hours into a real run."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_matching_tpu.models.superpoint import SuperPointBN
from image_matching_tpu.train import create_train_state
from image_matching_tpu.train.checkpoint import CheckpointManager
from image_matching_tpu.utils.weights import load_npz_into, save_npz

H = W = 64


def _run_cli(module_main, argv):
    old = sys.argv
    sys.argv = ["x"] + argv
    try:
        module_main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def cycle_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("cycle")


def test_pretrain_snapshot_warmstart_export(cycle_dir):
    root = str(cycle_dir)
    import image_matching_tpu.cli.train_superpoint as tsp

    _run_cli(tsp.main, [
        "--synthetic", "--run_dir", f"{root}/sp", "--batch_size", "2",
        "--train_iter", "2", "--save_interval", "2",
        "--height", str(H), "--width", str(W),
        "--tensorboard_interval", "1000", "--validation_interval", "1000",
    ])
    assert CheckpointManager(f"{root}/sp/checkpoints").latest_step() == 2

    # snapshot the checkpoint as npz (scripts/export_weights.py semantics)
    model = SuperPointBN(descriptor_dim=128, dtype=jnp.bfloat16)
    st = create_train_state(
        jax.random.PRNGKey(0), model, (jnp.zeros((1, H, W, 1)),),
        init_kwargs={"train": True},
    )
    st = CheckpointManager(f"{root}/sp/checkpoints").restore(st)
    save_npz(f"{root}/sp.npz", {"params": st.params,
                                "batch_stats": st.batch_stats})

    # warm-start a second run from the snapshot; its step-1 checkpoint
    # must carry the snapshot weights, not a fresh init
    _run_cli(tsp.main, [
        "--synthetic", "--run_dir", f"{root}/sp2", "--batch_size", "2",
        "--train_iter", "1", "--save_interval", "1",
        "--height", str(H), "--width", str(W),
        "--init_weights", f"{root}/sp.npz",
        "--tensorboard_interval", "1000", "--validation_interval", "1000",
    ])
    st2 = create_train_state(
        jax.random.PRNGKey(1), model, (jnp.zeros((1, H, W, 1)),),
        init_kwargs={"train": True},
    )
    st2 = CheckpointManager(f"{root}/sp2/checkpoints").restore(st2)
    snap = load_npz_into({"params": st.params, "batch_stats": st.batch_stats},
                         f"{root}/sp.npz")
    # one adam step at lr=1e-4 moves weights by <=~1e-4 per entry; a fresh
    # init would differ by O(1e-1)
    k_snap = np.asarray(
        jax.tree_util.tree_leaves(snap["params"]["inc"])[0], np.float32
    )
    k_new = np.asarray(
        jax.tree_util.tree_leaves(st2.params["inc"])[0], np.float32
    )
    assert k_snap.shape == k_new.shape
    assert np.max(np.abs(k_snap - k_new)) < 1e-2

    # HA export directly from the npz snapshot
    import cv2

    import image_matching_tpu.cli.export_pseudo as ep

    os.makedirs(f"{root}/data/train", exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(f"{root}/data/train/im_{i}.png",
                    (rng.random((H, W)) * 255).astype(np.uint8))
    _run_cli(ep.main, [
        "--data_root", f"{root}/data", "--out", f"{root}/labels",
        "--task", "train", "--checkpoint", f"{root}/sp.npz",
        "--height", str(H), "--width", str(W), "--batch_size", "2",
        "--num_homographies", "3",
    ])
    files = sorted(os.listdir(f"{root}/labels/train"))
    assert files == ["im_0.npz", "im_1.npz"]
    pts = np.load(f"{root}/labels/train/im_0.npz")["pts"]
    assert pts.ndim == 2 and pts.shape[1] == 3  # x, y, score rows

    # retrain from the exported pseudo-labels (cycle stage 3): needs a
    # val split too, and the labels dir layout from export_pseudo
    os.makedirs(f"{root}/data/val", exist_ok=True)
    rng2 = np.random.default_rng(1)
    cv2.imwrite(f"{root}/data/val/imv_0.png",
                (rng2.random((H, W)) * 255).astype(np.uint8))
    _run_cli(ep.main, [
        "--data_root", f"{root}/data", "--out", f"{root}/labels",
        "--task", "val", "--checkpoint", f"{root}/sp.npz",
        "--height", str(H), "--width", str(W), "--batch_size", "1",
        "--num_homographies", "3",
    ])
    _run_cli(tsp.main, [
        "--data_root", f"{root}/data", "--labels", f"{root}/labels",
        "--run_dir", f"{root}/sp3", "--batch_size", "2",
        "--train_iter", "2", "--save_interval", "2",
        "--height", str(H), "--width", str(W),
        "--init_weights", f"{root}/sp.npz",
        "--tensorboard_interval", "1000", "--validation_interval", "1000",
    ])
    assert CheckpointManager(f"{root}/sp3/checkpoints").latest_step() == 2
