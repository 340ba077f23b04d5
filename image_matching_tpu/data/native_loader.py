"""ctypes bindings for the native C++ image loader (native/imloader).

Replaces the reference's torch-DataLoader worker processes
(cv2.imread/resize per sample on Python workers) with a C++ thread pool
that decodes PNG/JPEG, grayscales, area-resizes and prefetches into a
bounded queue. Builds the shared library on first use (g++, libjpeg,
libpng — all baked into the image); falls back to the cv2 path in
data/datasets.py when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native" / "imloader"
_LIB: Optional[ctypes.CDLL] = None
_LIB_ERR: Optional[str] = None


def _build_and_load() -> ctypes.CDLL:
    global _LIB, _LIB_ERR
    if _LIB is not None:
        return _LIB
    if _LIB_ERR is not None:
        raise RuntimeError(_LIB_ERR)
    so = _NATIVE_DIR / "libimloader.so"
    src = _NATIVE_DIR / "imloader.cpp"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, text=True,
            )
        lib = ctypes.CDLL(str(so))
    except (subprocess.CalledProcessError, OSError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        _LIB_ERR = f"native imloader unavailable: {detail}"
        raise RuntimeError(_LIB_ERR) from e

    lib.iml_create.restype = ctypes.c_void_p
    lib.iml_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint,
    ]
    lib.iml_next_batch.restype = ctypes.c_int
    lib.iml_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.iml_destroy.argtypes = [ctypes.c_void_p]
    lib.iml_decode_file.restype = ctypes.c_int
    lib.iml_decode_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _build_and_load()
        return True
    except RuntimeError:
        return False


def decode_image(path: str, out_h: int, out_w: int) -> np.ndarray:
    """Single image → (out_h, out_w, 1) float32 [0,1] via the native path."""
    lib = _build_and_load()
    out = np.empty((out_h, out_w), np.float32)
    rc = lib.iml_decode_file(
        str(path).encode(), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"native decode failed: {path}")
    return out[..., None]


class NativeImageLoader:
    """Threaded prefetching loader over a list of image files.

    Yields (images (B, H, W, 1) float32, indices (B,) int) batches in
    shuffled order; `loop=True` reshuffles forever (training), False
    drains once (eval/export).
    """

    def __init__(
        self,
        paths: Sequence[str],
        height: int,
        width: int,
        n_threads: int = 4,
        queue_capacity: int = 32,
        loop: bool = True,
        seed: int = 0,
    ):
        self._lib = _build_and_load()
        self._paths: List[str] = [str(p) for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(
            *[p.encode() for p in self._paths]
        )
        self.height, self.width = height, width
        self._handle = self._lib.iml_create(
            arr, len(self._paths), height, width,
            n_threads, queue_capacity, int(loop), seed,
        )
        if not self._handle:
            raise RuntimeError("iml_create failed")

    def next_batch(self, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
        images = np.empty((batch_size, self.height, self.width), np.float32)
        indices = np.empty((batch_size,), np.int32)
        n = self._lib.iml_next_batch(
            self._handle,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            batch_size,
        )
        return images[:n][..., None], indices[:n]

    def batches(self, batch_size: int) -> Iterator[dict]:
        while True:
            images, idx = self.next_batch(batch_size)
            if len(images) == 0:
                return
            yield {"image": images, "indices": idx}

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.iml_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
