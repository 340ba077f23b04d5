"""Write a photographic-texture image dataset to disk in the ALLSS layout
(root/{train,val}/*.png) so the homographic-adaptation export → retrain
cycle (cli/export_pseudo → cli/train_superpoint --data_root) can run
end-to-end without the reference's LFS-stubbed imagery
(/root/reference/datasets/ALLSS.py expects exactly this layout).

  python scripts/make_photo_dataset.py --out datasets/PHOTO \
      --n_train 400 --n_val 40 --height 240 --width 320
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="datasets/PHOTO")
    p.add_argument("--n_train", type=int, default=400)
    p.add_argument("--n_val", type=int, default=40)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    import cv2

    from image_matching_tpu.evaluation import photo_texture

    rng = np.random.default_rng(args.seed)
    for task, n in (("train", args.n_train), ("val", args.n_val)):
        d = os.path.join(args.out, task)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            img = photo_texture(rng, args.height, args.width)
            cv2.imwrite(
                os.path.join(d, f"{task}_{i:05d}.png"),
                (img * 255).astype(np.uint8),
            )
        print(f"{task}: wrote {n} images to {d}")


if __name__ == "__main__":
    main()
