"""Host-side visualisation: keypoint overlays and match plots.

Parity: `make_matching_plot_fast` / `draw_keypoints`
(utils/utils.py:64-248) and `utils/draw.py:21-183`. Pure numpy/cv2,
consuming the framework's masked fixed-K structs.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 3:
        img = img[..., 0]
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def draw_keypoints(
    image: np.ndarray, xy: np.ndarray, mask: Optional[np.ndarray] = None,
    color=(0, 255, 0), radius: int = 3,
) -> np.ndarray:
    out = cv2.cvtColor(_to_u8(image), cv2.COLOR_GRAY2BGR)
    for i, p in enumerate(np.asarray(xy)):
        if mask is not None and not mask[i]:
            continue
        cv2.circle(out, (int(round(p[0])), int(round(p[1]))), radius, color, -1,
                   lineType=cv2.LINE_AA)
    return out


def make_matching_plot(
    image0: np.ndarray,
    image1: np.ndarray,
    xy0: np.ndarray,
    xy1: np.ndarray,
    matches0: np.ndarray,
    scores0: Optional[np.ndarray] = None,
    mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Side-by-side pair with score-colored match lines
    (make_matching_plot_fast, utils/utils.py:127-193)."""
    im0 = cv2.cvtColor(_to_u8(image0), cv2.COLOR_GRAY2BGR)
    im1 = cv2.cvtColor(_to_u8(image1), cv2.COLOR_GRAY2BGR)
    h0, w0 = im0.shape[:2]
    h1, w1 = im1.shape[:2]
    margin = 10
    h = max(h0, h1)
    out = np.full((h, w0 + w1 + margin, 3), 255, np.uint8)
    out[:h0, :w0] = im0
    out[:h1, w0 + margin:] = im1

    xy0 = np.asarray(xy0)
    xy1 = np.asarray(xy1)
    m0 = np.asarray(matches0)
    sc = np.asarray(scores0) if scores0 is not None else np.ones(len(m0))
    for i, j in enumerate(m0):
        if j < 0 or (mask is not None and not mask[i]):
            continue
        p0 = (int(round(xy0[i, 0])), int(round(xy0[i, 1])))
        p1 = (int(round(xy1[j, 0])) + w0 + margin, int(round(xy1[j, 1])))
        c = float(np.clip(sc[i], 0, 1))
        color = (int(255 * (1 - c)), int(255 * c), 0)  # red→green by score
        cv2.line(out, p0, p1, color, 1, lineType=cv2.LINE_AA)
        cv2.circle(out, p0, 2, color, -1, lineType=cv2.LINE_AA)
        cv2.circle(out, p1, 2, color, -1, lineType=cv2.LINE_AA)
    return out


def save_image(path: str, image: np.ndarray) -> None:
    cv2.imwrite(path, image)


def draw_tracks(image: np.ndarray, tracks, color_by_id: bool = True) -> np.ndarray:
    """Polyline overlay of multi-frame tracks on the newest frame —
    PointTracker's `draw_tracks` (model_wrap.py:546-578). `tracks` is the
    output of models/tracker.get_tracks: [(track_id, [(frame, x, y), ...])]."""
    out = cv2.cvtColor(_to_u8(image), cv2.COLOR_GRAY2BGR)
    for tid, obs in tracks:
        if color_by_id:
            hue = (tid * 37) % 180
            color = tuple(
                int(c)
                for c in cv2.cvtColor(
                    np.uint8([[[hue, 255, 255]]]), cv2.COLOR_HSV2BGR
                )[0, 0]
            )
        else:
            color = (0, 255, 0)
        pts = [(int(round(x)), int(round(y))) for _, x, y in obs]
        for p0, p1 in zip(pts[:-1], pts[1:]):
            cv2.line(out, p0, p1, color, 1, lineType=cv2.LINE_AA)
        cv2.circle(out, pts[-1], 2, color, -1, lineType=cv2.LINE_AA)
    return out


def heatmap_overlay(image: np.ndarray, heatmap: np.ndarray) -> np.ndarray:
    """Detector heatmap overlay for TB-style diagnostics
    (Train_model_frontend.py:446-502)."""
    base = cv2.cvtColor(_to_u8(image), cv2.COLOR_GRAY2BGR)
    hm = np.asarray(heatmap)
    if hm.ndim == 3:
        hm = hm[..., 0]
    hm = np.clip(hm / (hm.max() + 1e-9) * 255.0, 0, 255).astype(np.uint8)
    colored = cv2.applyColorMap(hm, cv2.COLORMAP_JET)
    return cv2.addWeighted(base, 0.6, colored, 0.4, 0)
