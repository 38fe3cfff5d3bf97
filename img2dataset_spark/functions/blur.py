"""T9: bounding-box blur (ImageNet face-obfuscation recipe) — pure numpy.

Reference semantics (/root/reference/img2dataset/blurrer.py:20-92):
  - bboxes are [x_min, y_min, x_max, y_max] floats in [0,1] relative to
    the ORIGINAL image shape;
  - each bbox is dilated by 10% of its own max side ("diagonal");
  - a binary mask marks all dilated boxes;
  - sigma = 0.1 * max_diagonal, kernel = max(3, 2*ceil(sigma)+1), odd;
  - both image and mask are Gaussian-blurred and blended:
        result = img*(1-blurred_mask) + blurred_img*blurred_mask

The reference delegates the blur itself to albumentations/OpenCV; this
implementation is a from-scratch separable Gaussian convolution in
numpy (reflect-101 borders, OpenCV's default), so it needs no imaging
library and is fully deterministic — no RNG is involved at all (the
reference's seed-42 calls only pin albumentations' parameter sampling,
which is degenerate here because blur_limit is a fixed kernel size).

Scale note: this runs inside the Arrow-batched transform UDF, one image
at a time per executor core — O(H*W*K) per image, the same cost model
as OpenCV's separable filter.
"""

from __future__ import annotations

import numpy as np


def gaussian_kernel_1d(kernel_size: int, sigma: float) -> np.ndarray:
    """Normalized 1-D Gaussian kernel (OpenCV getGaussianKernel formula)."""
    if kernel_size % 2 == 0 or kernel_size < 1:
        raise ValueError("kernel_size must be odd and positive")
    if sigma <= 0:
        # OpenCV's auto-sigma for a given kernel size
        sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    c = (kernel_size - 1) / 2.0
    x = np.arange(kernel_size, dtype=np.float64) - c
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _reflect101_pad(arr: np.ndarray, pad: int, axis: int) -> np.ndarray:
    """Reflect-101 ('abcdcb') padding along one axis, in chunks if the
    pad exceeds the axis length (np.pad 'reflect' caps at len-1)."""
    n = arr.shape[axis]
    if n == 1:
        reps = [1] * arr.ndim
        reps[axis] = 2 * pad + 1
        return np.tile(arr, reps)
    while pad > 0:
        step = min(pad, n - 1)
        width = [(0, 0)] * arr.ndim
        width[axis] = (step, step)
        arr = np.pad(arr, width, mode="reflect")
        pad -= step
        n = arr.shape[axis]
    return arr


def _convolve_axis(img: np.ndarray, kernel: np.ndarray, axis: int) -> np.ndarray:
    """Correlate a (H, W, C) float array with a 1-D kernel along axis."""
    k = len(kernel)
    pad = k // 2
    padded = _reflect101_pad(img, pad, axis)
    out = np.zeros_like(img, dtype=np.float32)
    # accumulate shifted slices — vectorized over the whole image per tap
    for i in range(k):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(i, i + img.shape[axis])
        out += kernel[i] * padded[tuple(sl)]
    return out


def gaussian_blur(img: np.ndarray, kernel_size: int, sigma: float) -> np.ndarray:
    """Separable 2-D Gaussian blur of an (H, W[, C]) float array."""
    k = gaussian_kernel_1d(kernel_size, sigma)
    return _convolve_axis(_convolve_axis(img.astype(np.float32), k, 0), k, 1)


def blur_bboxes(img: np.ndarray, bbox_list) -> np.ndarray:
    """Blur the dilated bbox regions of a uint8 (H, W[, C]) image.

    Mirrors /root/reference/img2dataset/blurrer.py:20-92 step for step.
    """
    bboxes = [
        b
        for b in (bbox_list if bbox_list is not None else [])
        if b is not None
    ]
    if len(bboxes) == 0:
        return img

    height, width = img.shape[:2]
    fimg = img.astype(np.float32) / 255.0
    mask = np.zeros_like(fimg)

    max_diagonal = 0
    for bbox in bboxes:
        # float32 multiply, exactly like the reference under NumPy 2 weak
        # promotion (bbox.npy is float32; float32 * int stays float32).
        # Verified against the golden: f64 here lands 234*0.60154 at
        # 233.9999..., one pixel off the reference's mask.
        x0 = int(np.float32(bbox[0]) * np.float32(width))
        y0 = int(np.float32(bbox[1]) * np.float32(height))
        x1 = int(np.float32(bbox[2]) * np.float32(width))
        y1 = int(np.float32(bbox[3]) * np.float32(height))
        diagonal = max(x1 - x0, y1 - y0)
        max_diagonal = max(max_diagonal, diagonal)
        # 10% dilation (imagenet-face-obfuscation recipe)
        x0 = int(np.clip(int(x0 - 0.1 * diagonal), 0, width - 1))
        y0 = int(np.clip(int(y0 - 0.1 * diagonal), 0, height - 1))
        x1 = int(np.clip(int(x1 + 0.1 * diagonal), 0, width - 1))
        y1 = int(np.clip(int(y1 + 0.1 * diagonal), 0, height - 1))
        mask[y0:y1, x0:x1, ...] = 1.0

    sigma = 0.1 * max_diagonal
    kernel_size = max(3, int(2 * np.ceil(sigma) + 1))
    if kernel_size % 2 == 0:
        kernel_size += 1

    # sigma sizes the KERNEL only; the Gaussian itself uses OpenCV's
    # auto-sigma (sigma=0 path) because the reference's A.GaussianBlur
    # call never receives sigma (blurrer.py:83, albumentations
    # sigma_limit default 0).  Verified pixel-exact vs blurred.png.
    blurred_img = gaussian_blur(fimg, kernel_size, 0)
    blurred_mask = gaussian_blur(mask, kernel_size, 0)
    result = fimg * (1.0 - blurred_mask) + blurred_img * blurred_mask
    # Truncating cast, exactly like the reference (blurrer.py:91
    # `(result * 255.0).astype(np.uint8)`) — bit-level parity with its
    # goldens requires matching its rounding, not improving on it.
    return np.clip(result * 255.0, 0, 255).astype(np.uint8)
