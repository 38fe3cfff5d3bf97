"""Numpy image resampling — the pixel backend for resize when no imaging
library is installed (PNG path, paired with functions/png.py).

Implements the interpolation families the reference maps to OpenCV
(resizer.py:49-58: nearest/linear/cubic/area/lanczos4) as separable
per-axis weight matrices with pixel-center alignment
(src = (dst + 0.5) * scale - 0.5) and replicate borders.

Parity status (honest): formula-level parity with the standard
definitions (area = exact fractional box coverage; cubic = Catmull-Rom
with a = -0.75, OpenCV's constant; lanczos4 = sinc(d)*sinc(d/4) over 8
taps, normalized).  Bit-level parity with cv2.resize is NOT asserted —
cv2 runs fixed-point arithmetic for uint8 — and there is no cv2 in this
sandbox to golden-test against; the tests pin the analytically exact
cases instead (identity, integer box means, affine invariance of
bilinear on ramps).
"""

from __future__ import annotations

import numpy as np


def _axis_weights(n_in: int, n_out: int, mode: str) -> np.ndarray:
    """(n_out, n_in) weight matrix for one axis."""
    s = n_in / n_out
    W = np.zeros((n_out, n_in), dtype=np.float64)
    if mode == "area":
        # exact fractional coverage of the span [i*s, (i+1)*s)
        for i in range(n_out):
            lo, hi = i * s, (i + 1) * s
            j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
            for j in range(j0, min(j1, n_in)):
                W[i, j] = min(hi, j + 1) - max(lo, j)
            W[i] /= W[i].sum()
        return W
    centers = (np.arange(n_out) + 0.5) * s - 0.5
    if mode == "nearest":
        idx = np.clip(np.floor(centers + 0.5).astype(int), 0, n_in - 1)
        W[np.arange(n_out), idx] = 1.0
        return W
    if mode in ("linear", "bilinear"):
        taps, kernel = 1, lambda d: np.maximum(0.0, 1.0 - np.abs(d))
    elif mode in ("cubic", "bicubic"):
        taps, kernel = 2, _catmull_rom
    elif mode in ("lanczos", "lanczos4"):
        taps, kernel = 4, _lanczos4
    else:
        raise ValueError(f"unknown interpolation {mode}")
    for i in range(n_out):
        c = centers[i]
        j0 = int(np.floor(c)) - taps + 1
        js = np.arange(j0, j0 + 2 * taps)
        w = kernel(c - js)
        w /= w.sum()
        np.add.at(W[i], np.clip(js, 0, n_in - 1), w)  # replicate border
    return W


def _catmull_rom(d: np.ndarray) -> np.ndarray:
    """Cubic kernel with a = -0.75 (OpenCV's bicubic constant)."""
    a = -0.75
    d = np.abs(d)
    out = np.where(
        d <= 1,
        (a + 2) * d**3 - (a + 3) * d**2 + 1,
        np.where(d < 2, a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a, 0.0),
    )
    return out


def _lanczos4(d: np.ndarray) -> np.ndarray:
    return np.sinc(d) * np.sinc(d / 4.0)


def resize(img: np.ndarray, out_w: int, out_h: int, mode: str = "bilinear") -> np.ndarray:
    """Resize an (H, W[, C]) uint8/float array to (out_h, out_w)."""
    arr = np.asarray(img)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if (out_h, out_w) == (h, w):
        out = arr.astype(np.float64)
    else:
        Wh = _axis_weights(h, out_h, mode)
        Ww = _axis_weights(w, out_w, mode)
        tmp = (Wh @ arr.reshape(h, w * c).astype(np.float64)).reshape(out_h, w, c)
        out = (Ww @ tmp.transpose(1, 0, 2).reshape(w, out_h * c)).reshape(
            out_w, out_h, c
        ).transpose(1, 0, 2)
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    else:
        out = out.astype(img.dtype)
    return out[:, :, 0] if squeeze else out


def pad_center(
    img: np.ndarray, out_w: int, out_h: int, value: int = 255
) -> np.ndarray:
    """Center the image on a constant canvas (reference border mode:
    A.PadIfNeeded BORDER_CONSTANT value [255,255,255], resizer.py:209-214).
    Albumentations centers with top/left = floor(missing / 2)."""
    h, w = img.shape[:2]
    canvas = np.full((out_h, out_w) + img.shape[2:], value, dtype=img.dtype)
    top, left = (out_h - h) // 2, (out_w - w) // 2
    canvas[top : top + h, left : left + w] = img
    return canvas


def crop_center(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Center crop (reference center_crop mode: A.CenterCrop).
    Albumentations takes top/left = floor((size - crop) / 2)."""
    h, w = img.shape[:2]
    top, left = (h - out_h) // 2, (w - out_w) // 2
    return img[top : top + out_h, left : left + out_w]
