"""Host-side datasets: file listing, decode, resize — nothing clever.

Parity targets: `datasets/ALLSS.py` (train/val images + .npz pseudo-label
points), `datasets/SSHIDataset.py` (template + source dir eval pairs) and
the name→class registry (`datasets/__init__.py:1-7`). Everything
stochastic or warp-related that the reference does inside __getitem__ on
worker CPUs (homography sampling, label splatting, photometric aug) is
NOT here — it runs on-device in data/pipeline.py, so the host side stays
a thin IO layer (and can be swapped for the native C++ loader).

Also adds `SyntheticShapesDataset`: procedurally generated corners with
exact ground truth, the standard bootstrap for training a detector from
scratch (the reference assumes pseudo-labels already exist; synthetic
shapes make the pipeline self-contained).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".tif", ".tiff"}


def _load_gray(path: str, resize: Optional[Tuple[int, int]] = None,
               resize_scale: Optional[float] = None) -> np.ndarray:
    """Image file → float32 grayscale (H, W, 1) in [0, 1]."""
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    if resize is not None:
        h, w = resize
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
    elif resize_scale is not None and resize_scale != 1.0:
        img = cv2.resize(
            img, None, fx=resize_scale, fy=resize_scale,
            interpolation=cv2.INTER_AREA,
        )
    return (img.astype(np.float32) / 255.0)[..., None]


def _list_images(directory: str) -> List[str]:
    files = [
        os.path.join(directory, f)
        for f in sorted(os.listdir(directory))
        if Path(f).suffix.lower() in IMAGE_EXTS
    ]
    return files


def pad_points(pts: np.ndarray, capacity: int) -> Tuple[np.ndarray, np.ndarray]:
    """(N, 2) float points → ((K, 2), (K,)) padded array + validity mask."""
    k = capacity
    out = np.zeros((k, 2), np.float32)
    mask = np.zeros((k,), bool)
    n = min(len(pts), k)
    if n:
        out[:n] = pts[:n]
        mask[:n] = True
    return out, mask


class ALLSSDataset:
    """Images (+ optional .npz pseudo-label points) under root/{train,val}.

    Mirrors datasets/ALLSS.py:11-133: images resized to `resize`,
    grayscale [0, 1]; labels are the exported `.npz` files holding `pts`
    rows (x, y, score) (superpoint_export_pseudo.py:95-110), padded here
    to a fixed capacity.
    """

    def __init__(
        self,
        root: str,
        task: str = "train",
        labels_dir: Optional[str] = None,
        resize: Tuple[int, int] = (480, 640),
        max_points: int = 1200,
    ):
        self.root = os.path.join(root, task)
        self.files = _list_images(self.root)
        self.labels_dir = os.path.join(labels_dir, task) if labels_dir else None
        self.resize = resize
        self.max_points = max_points

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> dict:
        path = self.files[idx]
        image = _load_gray(path, resize=self.resize)
        sample = {"image": image, "name": Path(path).stem}
        if self.labels_dir:
            npz = os.path.join(self.labels_dir, Path(path).stem + ".npz")
            data = np.load(npz)
            pts = data["pts"]  # rows (x, y[, score])
            xy, mask = pad_points(pts[:, :2].astype(np.float32), self.max_points)
            sample["points"] = xy
            sample["points_mask"] = mask
        return sample

    def _load_points(self, idx: int):
        npz = os.path.join(
            self.labels_dir, Path(self.files[idx]).stem + ".npz"
        )
        pts = np.load(npz)["pts"]
        return pad_points(pts[:, :2].astype(np.float32), self.max_points)

    def batches(self, batch_size: int, shuffle: bool = True,
                seed: int = 0, drop_last: bool = True,
                native: bool = False, n_threads: int = 4) -> Iterator[dict]:
        """Batch iterator. `native=True` decodes/resizes through the C++
        threaded prefetch loader (native/imloader) instead of cv2 —
        labels (if any) are still read per-index from their .npz files."""
        if native:
            from image_matching_tpu.data.native_loader import NativeImageLoader

            loader = NativeImageLoader(
                self.files, self.resize[0], self.resize[1],
                n_threads=n_threads, loop=True, seed=seed,
            )
            try:
                while True:
                    images, idxs = loader.next_batch(batch_size)
                    if len(images) < batch_size and drop_last:
                        continue
                    batch = {"image": images}
                    ok = idxs >= 0
                    idxs = np.where(ok, idxs, 0)
                    if self.labels_dir:
                        pts = [self._load_points(int(i)) for i in idxs]
                        batch["points"] = np.stack([p[0] for p in pts])
                        batch["points_mask"] = np.stack(
                            [p[1] & o for p, o in zip(pts, ok)]
                        )
                    batch["names"] = [
                        Path(self.files[int(i)]).stem for i in idxs
                    ]
                    yield batch
            finally:
                loader.close()
            return

        order = np.arange(len(self))
        rng = np.random.default_rng(seed)
        while True:
            if shuffle:
                rng.shuffle(order)
            for start in range(0, len(order) - (batch_size - 1 if drop_last else 0),
                               batch_size):
                idxs = order[start:start + batch_size]
                if len(idxs) < batch_size and drop_last:
                    continue
                samples = [self[i] for i in idxs]
                batch = {
                    k: np.stack([s[k] for s in samples])
                    for k in samples[0]
                    if k != "name"
                }
                batch["names"] = [s["name"] for s in samples]
                yield batch


class SSHIDataset:
    """Template-vs-source eval pairs (datasets/SSHIDataset.py:6-32):
    one template image + a directory of source images, all grayscale,
    optionally downscaled by `resize_scale`."""

    def __init__(self, template_path: str, source_dir: str,
                 resize_scale: float = 1.0):
        self.template_path = template_path
        self.files = _list_images(source_dir)
        self.resize_scale = resize_scale
        self._template = _load_gray(template_path, resize_scale=resize_scale)

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> dict:
        path = self.files[idx]
        return {
            "source_orig": _load_gray(path),
            "source": _load_gray(path, resize_scale=self.resize_scale),
            "template": self._template,
            "name": Path(path).stem,
        }


class SyntheticShapesDataset:
    """Random polygons / lines / checkerboards with exact corner GT."""

    def __init__(self, height: int = 240, width: int = 320,
                 max_points: int = 64, seed: int = 0):
        self.h, self.w = height, width
        self.max_points = max_points
        self.rng = np.random.default_rng(seed)

    def sample(self) -> dict:
        h, w = self.h, self.w
        img = np.full((h, w), self.rng.uniform(0.0, 0.3), np.float32)
        pts: List[Tuple[float, float]] = []
        margin = max(4, min(h, w) // 8)
        kind = self.rng.integers(0, 3)
        if kind == 0:  # random convex-ish polygons
            for _ in range(self.rng.integers(1, 4)):
                n = int(self.rng.integers(3, 7))
                cx = self.rng.uniform(margin, w - margin)
                cy = self.rng.uniform(margin, h - margin)
                rmax = min(h, w) * 0.2
                radii = self.rng.uniform(rmax * 0.3, rmax, n)
                angles = np.sort(self.rng.uniform(0, 2 * np.pi, n))
                poly = np.stack(
                    [cx + radii * np.cos(angles), cy + radii * np.sin(angles)], -1
                )
                shade = self.rng.uniform(0.4, 1.0)
                cv2.fillPoly(img, [poly.astype(np.int32)], shade)
                pts.extend([tuple(p) for p in poly])
        elif kind == 1:  # line segments
            for _ in range(self.rng.integers(2, 8)):
                p0 = self.rng.uniform([margin, margin], [w - margin, h - margin])
                p1 = self.rng.uniform([margin, margin], [w - margin, h - margin])
                cv2.line(
                    img, tuple(p0.astype(int)), tuple(p1.astype(int)),
                    float(self.rng.uniform(0.4, 1.0)), 2,
                )
                pts.extend([tuple(p0), tuple(p1)])
        else:  # checkerboard patch
            rows, cols = self.rng.integers(3, 6, 2)
            cell = max(4, int(self.rng.uniform(min(h, w) / 16, min(h, w) / 8)))
            x0 = int(self.rng.integers(margin, max(margin + 1, w - cols * cell - margin)))
            y0 = int(self.rng.integers(margin, max(margin + 1, h - rows * cell - margin)))
            for r in range(rows):
                for c in range(cols):
                    if (r + c) % 2 == 0:
                        cv2.rectangle(
                            img,
                            (x0 + c * cell, y0 + r * cell),
                            (x0 + (c + 1) * cell, y0 + (r + 1) * cell),
                            float(self.rng.uniform(0.6, 1.0)),
                            -1,
                        )
            for r in range(rows + 1):
                for c in range(cols + 1):
                    pts.append((x0 + c * cell, y0 + r * cell))
        pts_arr = np.asarray(
            [p for p in pts if 0 <= p[0] < w and 0 <= p[1] < h], np.float32
        ).reshape(-1, 2)
        xy, mask = pad_points(pts_arr, self.max_points)
        return {"image": img[..., None], "points": xy, "points_mask": mask}

    def batches(self, batch_size: int) -> Iterator[dict]:
        while True:
            samples = [self.sample() for _ in range(batch_size)]
            yield {
                k: np.stack([s[k] for s in samples]) for k in samples[0]
            }


DATASET_REGISTRY = {
    "ALLSS": ALLSSDataset,
    "SSHI": SSHIDataset,
    "synthetic_shapes": SyntheticShapesDataset,
}


def get_dataset(name: str, **kwargs):
    return DATASET_REGISTRY[name](**kwargs)
