"""Measure the reference implementation's detect+match throughput.

Imports the reference code (read-only at /root/reference) and times its
SuperPoint + SuperGlue forward path at the bench.py regime: 480x640
pair, descriptor_dim 256, 18 GNN layers, 30 Sinkhorn iterations, max
1024 keypoints, random-initialised weights (the repo's .pth files are
unfetched LFS stubs; throughput does not depend on weight values).

Hardware caveat recorded in the output: this environment has no CUDA
GPU, so the rerun executes on torch-CPU — the reference targets a
CUDA-10.1-era GPU (README.md:26). The asymmetry is documented in
BASELINE.md; treat vs_baseline accordingly.

Writes ./reference_baseline.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np
import torch


def main():
    torch.manual_seed(0)
    from superglue.models.superglue_test import SuperGlue
    from superpoint.models.superpoint_test import SuperPoint

    sp = SuperPoint(
        {
            "weights": "",
            "descriptor_dim": 256,
            "nms_radius": 4,
            "keypoint_threshold": 0.005,
            "max_keypoints": 1024,
        }
    ).eval()
    sg = SuperGlue(
        {
            "weights": "",
            "descriptor_dim": 256,
            "keypoint_encoder": [32, 64, 128, 256],
            "GNN_layers": ["self", "cross"] * 9,
            "sinkhorn_iterations": 30,
            "match_threshold": 0.1,
        }
    ).eval()

    rng = np.random.default_rng(0)
    n_pairs = 3
    times = []
    with torch.no_grad():
        for i in range(n_pairs + 1):  # first is warmup
            img0 = torch.from_numpy(
                rng.uniform(0, 1, (1, 1, 480, 640)).astype(np.float32)
            )
            img1 = torch.from_numpy(
                rng.uniform(0, 1, (1, 1, 480, 640)).astype(np.float32)
            )
            t0 = time.perf_counter()
            p0 = sp(img0)
            p1 = sp(img1)
            data = {
                "image0": img0,
                "image1": img1,
                "keypoints0": torch.stack(p0["keypoints"]),
                "scores0": torch.stack(p0["scores"]),
                "descriptors0": torch.stack(p0["descriptors"]),
                "keypoints1": torch.stack(p1["keypoints"]),
                "scores1": torch.stack(p1["scores"]),
                "descriptors1": torch.stack(p1["descriptors"]),
            }
            sg(data)
            dt = time.perf_counter() - t0
            if i > 0:
                times.append(dt)
            print(f"pair {i}: {dt:.3f}s", file=sys.stderr)

    per_pair = float(np.median(times))
    out = {
        "superpoint_superglue_pairs_per_s": 1.0 / per_pair,
        "seconds_per_pair": per_pair,
        "config": "480x640, K<=1024, 256d, 18L GNN, 30 sinkhorn",
        "implementation": "reference PH8411/image-matching (torch, eval mode)",
        "hardware": f"torch-CPU ({torch.get_num_threads()} threads) — "
        "no CUDA GPU available in this environment",
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open("reference_baseline.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
