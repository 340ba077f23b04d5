"""Sequence registration CLI — frames → pairwise registration → pose
graph → (optional) track-based bundle adjustment → trajectory.

The multi-frame layer the reference never had (its closest analog is the
per-pair loop of `traditional.py` plus `PointTracker`,
superpoint/models/model_wrap.py:355-544). Frames are registered along
consecutive + stride-K loop-closure edges with the classical SIFT/ORB
front end, the pose graph is solved globally (slam/pose_graph.py), and
with --ba the trajectory is refined by robust bundle adjustment over
SIFT point tracks (slam/bundle_adjustment.py). Writes TRAJECTORY.json
with per-frame world-from-frame similarity params [a, b, tx, ty].

Usage:
  python -m image_matching_tpu.cli.sequence --frames_dir video_frames/ \
      --out TRAJECTORY.json --method sift --strides 1 4 --ba
  # or, with no data, a synthetic self-check with ATE against GT:
  python -m image_matching_tpu.cli.sequence --synthetic --ba
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from image_matching_tpu.utils.logging import get_logger

log = get_logger("sequence")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames_dir", help="directory of frame images (sorted)")
    p.add_argument("--synthetic", action="store_true",
                   help="run on a synthetic drifting-camera sequence with GT")
    p.add_argument("--n_frames", type=int, default=12)
    p.add_argument("--out", default="TRAJECTORY.json")
    p.add_argument("--method", default="sift", choices=["sift", "orb"])
    p.add_argument("--strides", type=int, nargs="+", default=[1, 4])
    p.add_argument("--ba", action="store_true",
                   help="refine with track-based robust bundle adjustment")
    p.add_argument("--min_track_length", type=int, default=3)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def load_frames(frames_dir):
    import cv2

    names = sorted(
        f for f in os.listdir(frames_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tif"))
    )
    frames = []
    for n in names:
        img = cv2.imread(os.path.join(frames_dir, n), cv2.IMREAD_GRAYSCALE)
        frames.append((img.astype(np.float32) / 255.0)[..., None])
    return frames, names


def main():
    from image_matching_tpu.features.registration import (
        build_classical_registration_fn,
    )
    from image_matching_tpu.slam import absolute_trajectory_error
    from image_matching_tpu.slam.sequence import (
        refine_trajectory_with_tracks,
        register_sequence,
        solve_trajectory,
    )
    from image_matching_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args()

    gt_rel = None
    if args.synthetic:
        from image_matching_tpu.slam.bundle_adjustment import invert_similarity
        from image_matching_tpu.slam.pose_graph import compose_similarity
        from image_matching_tpu.evaluation import make_synthetic_sequence as make_sequence

        rng = np.random.default_rng(args.seed)
        frames, gt = make_sequence(rng, n_frames=args.n_frames)
        names = [f"synthetic_{i:03d}" for i in range(len(frames))]
        gt_j = jnp.asarray(gt)
        gt_rel = compose_similarity(invert_similarity(gt_j[0])[None], gt_j)
    elif args.frames_dir:
        frames, names = load_frames(args.frames_dir)
    else:
        raise SystemExit("provide --frames_dir or --synthetic")
    n = len(frames)
    log.info("%d frames", n)

    register = jax.jit(build_classical_registration_fn(args.method))
    graph = register_sequence(
        register, frames, jax.random.PRNGKey(args.seed),
        strides=tuple(args.strides),
    )
    n_valid = int(jnp.sum(graph.weight > 0))
    log.info("pose graph: %d/%d valid edges", n_valid, graph.src.shape[0])
    traj = solve_trajectory(graph, iters=args.iters)

    result = {"frames": names, "method": args.method,
              "valid_edges": n_valid, "stage": "pose_graph"}
    if gt_rel is not None:
        ate = float(absolute_trajectory_error(traj, gt_rel, align=True))
        result["ate_pose_graph_px"] = round(ate, 4)
        log.info("pose-graph ATE %.4f px", ate)

    if args.ba:
        from image_matching_tpu.features.sift import sift_detect_and_describe
        from image_matching_tpu.models.tracker import (
            get_tracks,
            tracker_init,
            tracker_update,
        )

        state = tracker_init(max_length=n, capacity=1024, desc_dim=128)
        for fr in frames:
            kp = sift_detect_and_describe(jnp.asarray(fr[..., 0]))
            state = tracker_update(state, kp, max_dist=0.9)
        tracks = get_tracks(state, min_length=args.min_track_length)
        log.info("%d tracks (>= %d obs)", len(tracks), args.min_track_length)
        traj, landmarks = refine_trajectory_with_tracks(
            tracks, traj, n, iters=args.iters,
            min_track_length=args.min_track_length,
        )
        result["stage"] = "bundle_adjusted"
        result["num_tracks"] = len(tracks)
        result["num_landmarks"] = int(landmarks.shape[0])
        if gt_rel is not None:
            ate = float(absolute_trajectory_error(traj, gt_rel, align=True))
            result["ate_bundle_adjusted_px"] = round(ate, 4)
            log.info("bundle-adjusted ATE %.4f px", ate)

    result["trajectory"] = np.asarray(traj).tolist()
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    log.info("wrote %s", args.out)
    print(json.dumps({k: v for k, v in result.items() if k != "trajectory"}))


if __name__ == "__main__":
    main()
