"""CLI smoke tests (tiny configs, synthetic data, tmp dirs)."""
import os
import sys

import numpy as np
import pytest


def run_cli(monkeypatch, module_main, argv):
    monkeypatch.setattr(sys, "argv", argv)
    module_main()


class TestTrainSuperPointCLI:
    def test_synthetic_smoke(self, monkeypatch, tmp_path):
        from image_matching_tpu.cli.train_superpoint import main

        run_cli(
            monkeypatch, main,
            [
                "train_superpoint", "--synthetic",
                "--run_dir", str(tmp_path / "run"),
                "--train_iter", "2", "--batch_size", "2",
                "--height", "64", "--width", "64",
                "--descriptor_dim", "32",
                "--tensorboard_interval", "1",
                "--validation_interval", "2",
                "--save_interval", "2",
            ],
        )
        assert os.path.isdir(tmp_path / "run" / "checkpoints")


class TestTrainSuperGlueCLI:
    def test_synthetic_smoke(self, monkeypatch, tmp_path):
        from image_matching_tpu.cli.train_superglue import main

        run_cli(
            monkeypatch, main,
            [
                "train_superglue", "--synthetic",
                "--run_dir", str(tmp_path / "run"),
                "--epochs", "1", "--steps_per_epoch", "2",
                "--batch_size", "2",
                "--height", "64", "--width", "64",
                "--descriptor_dim", "32",
                "--keypoint_encoder", "16", "32",
                "--gnn_layers", "2",
                "--sinkhorn_iterations", "5",
                "--max_keypoints", "64",
                "--log_interval", "1",
            ],
        )
        assert os.path.isdir(tmp_path / "run" / "checkpoints")


class TestMatchPairCLI:
    def test_ratio_matcher_smoke(self, monkeypatch, tmp_path):
        import cv2

        rng = np.random.default_rng(0)
        img = (rng.uniform(0, 255, (96, 96))).astype(np.uint8)
        img = cv2.blur(img, (5, 5))
        tpl_path = str(tmp_path / "template.png")
        src_dir = tmp_path / "sources"
        src_dir.mkdir()
        cv2.imwrite(tpl_path, img)
        m = np.float32([[1, 0, 8], [0, 1, 8]])
        warped = cv2.warpAffine(img, m, (96, 96))
        cv2.imwrite(str(src_dir / "s1.png"), warped)

        from image_matching_tpu.cli.match_pair import main

        out = tmp_path / "out"
        run_cli(
            monkeypatch, main,
            [
                "match_pair",
                "--template", tpl_path,
                "--source_dir", str(src_dir),
                "--out", str(out),
                "--matcher", "ratio",
                "--resize_scale", "1.0",
                "--max_keypoints", "128",
                "--keypoint_threshold", "0.0",
                "--descriptor_dim", "32",
            ],
        )
        assert (out / "s1_transform.txt").exists()
        assert (out / "s1_matches.png").exists()
        mat = np.loadtxt(out / "s1_transform.txt")
        assert mat.shape == (2, 3)


class TestExportPseudoCLI:
    def test_export_smoke(self, monkeypatch, tmp_path):
        import cv2

        rng = np.random.default_rng(1)
        for task in ("train",):
            d = tmp_path / "data" / task
            d.mkdir(parents=True)
            for i in range(2):
                cv2.imwrite(
                    str(d / f"im{i}.png"),
                    rng.uniform(0, 255, (64, 64)).astype(np.uint8),
                )

        from image_matching_tpu.cli.export_pseudo import main

        run_cli(
            monkeypatch, main,
            [
                "export_pseudo",
                "--data_root", str(tmp_path / "data"),
                "--out", str(tmp_path / "labels"),
                "--height", "64", "--width", "64",
                "--num_homographies", "4",
                "--top_k", "64",
                "--detection_threshold", "0.0",
                "--descriptor_dim", "32",
                "--batch_size", "2",
            ],
        )
        files = os.listdir(tmp_path / "labels" / "train")
        assert "im0.npz" in files and "im1.npz" in files
        pts = np.load(tmp_path / "labels" / "train" / "im0.npz")["pts"]
        assert pts.shape[1] == 3


class TestTraditionalCLI:
    def test_sift_smoke(self, monkeypatch, tmp_path):
        import cv2

        rng = np.random.default_rng(2)
        img = np.zeros((128, 128), np.float32)
        for _ in range(30):
            c = rng.uniform(16, 112, 2)
            cv2.circle(img, (int(c[0]), int(c[1])), int(rng.uniform(2, 6)),
                       float(rng.uniform(0.5, 1.0)), -1)
        img8 = (img * 255).astype(np.uint8)
        tpl_path = str(tmp_path / "template.png")
        src_dir = tmp_path / "sources"
        src_dir.mkdir()
        cv2.imwrite(tpl_path, img8)
        m = np.float32([[1, 0, 10], [0, 1, -5]])
        cv2.imwrite(str(src_dir / "s1.png"), cv2.warpAffine(img8, m, (128, 128)))

        from image_matching_tpu.cli.traditional import main

        out = tmp_path / "out"
        run_cli(
            monkeypatch, main,
            [
                "traditional",
                "--template", tpl_path,
                "--source_dir", str(src_dir),
                "--out", str(out),
                "--method", "sift",
                "--resize_scale", "1.0",
            ],
        )
        mat = np.loadtxt(out / "s1_transform.txt")
        assert mat.shape == (2, 3)
        np.testing.assert_allclose(mat[:, 2], [10, -5], atol=3.0)


class TestSequenceCLI:
    def test_synthetic_ba_smoke(self, monkeypatch, tmp_path):
        import json

        from image_matching_tpu.cli.sequence import main

        out = tmp_path / "traj.json"
        run_cli(
            monkeypatch, main,
            ["sequence", "--synthetic", "--ba", "--n_frames", "6",
             "--out", str(out), "--iters", "150"],
        )
        result = json.loads(out.read_text())
        assert result["stage"] == "bundle_adjusted"
        assert len(result["trajectory"]) == 6
        assert result["valid_edges"] >= 4
        # globally solved trajectory should be sub-pixel on the synthetic
        assert result["ate_bundle_adjusted_px"] < 1.0
