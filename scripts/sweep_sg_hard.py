"""Sweep SuperGlue eval knobs on the hard regime (perspective + asym).

Runs cli.evaluate's spsg config across (weights, match_threshold,
conf_gamma) on the hard regime to close the gap vs sp+ratio (VERDICT
round-2 item 1 residue: sp 1.77 px vs spsg 2.11).

  python scripts/sweep_sg_hard.py
"""
import itertools
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMBOS = [
    # (sg_weights, match_threshold, conf_gamma)
    ("weights/sg_persp.npz", 0.1, 1.0),   # current flagship setting
    ("weights/sg_persp.npz", 0.1, 2.0),
    ("weights/sg_persp.npz", 0.1, 4.0),
    ("weights/sg_persp.npz", 0.2, 2.0),
    ("weights/sg_persp.npz", 0.3, 1.0),
    ("weights/sg_persp.npz", 0.3, 2.0),
    ("weights/sg_persp.npz", 0.4, 2.0),
    ("weights/sg_persp.npz", 0.5, 1.0),
    ("weights/sg_photo.npz", 0.1, 2.0),
    ("weights/sg_hard.npz", 0.1, 1.0),
    ("weights/sg_hard.npz", 0.2, 2.0),
]


def main():
    results = {}
    for sg, thr, gamma in COMBOS:
        out = f"/tmp/sweep_{os.path.basename(sg)}_{thr}_{gamma}.json"
        cmd = [
            sys.executable, "-m", "image_matching_tpu.cli.evaluate",
            "--configs", "spsg",
            "--gt", "perspective", "--photo_asym",
            "--ransac_model", "homography",
            "--sp_checkpoint", "weights/sp_photo.npz",
            "--sg_checkpoint", sg,
            "--match_threshold", str(thr),
            "--conf_gamma", str(gamma),
            "--out", out,
        ]
        subprocess.run(cmd, cwd=HERE, check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(out) as f:
            r = json.load(f)["spsg"]
        key = f"{os.path.basename(sg)} thr={thr} gamma={gamma}"
        results[key] = r
        print(f"{key}: err {r['mean_corner_err_px']:.3f} px  "
              f"succ {r['success_rate']:.2f}  matches {r['mean_matches']:.0f} "
              f"inliers {r['mean_inliers']:.0f}", flush=True)
    with open("/tmp/sweep_sg_hard_all.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
