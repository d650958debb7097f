"""Image-grid dumps and batch statistics.

Parity with the reference viz utilities
(`medical_image_segmentation/analyze_data/pytorch_datasets.py:298-407`):

- ``save_image_grid``: tile a batch into one PNG (:298-324);
- ``save_combined_image_grid``: grayscale image with predictions overlaid
  in red and ground truth in blue (:327-373) — the reference version
  crashes on `images.float(pred_masks)` (:342); fixed here;
- ``print_batch_stats``: dtype/shape/min/max/mean/std per tensor (:376-407).
"""

from __future__ import annotations

import os
import sys

import numpy as np


def _to_grid(batch: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """(B,H,W,C) uint8 → one (GH,GW,C) grid image."""
    b, h, w, c = batch.shape
    ncol = min(nrow, b)
    nr = -(-b // ncol)
    grid = np.zeros((nr * (h + pad) + pad, ncol * (w + pad) + pad, c), np.uint8)
    for i in range(b):
        r, col = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + col * (w + pad)
        grid[y : y + h, x : x + w] = batch[i]
    return grid


def _normalize_to_uint8(images: np.ndarray) -> np.ndarray:
    img = np.asarray(images, np.float32)
    lo, hi = img.min(), img.max()
    if hi > lo:
        img = (img - lo) / (hi - lo)
    return (img * 255).astype(np.uint8)


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    """images: (B,H,W,C) any-range floats or uint8."""
    import cv2

    if images.ndim == 3:
        images = images[..., None]
    grid = _to_grid(_normalize_to_uint8(images), nrow)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, grid)


def save_combined_image_grid(
    images: np.ndarray,
    pred_masks: np.ndarray,
    masks: np.ndarray,
    path: str,
    nrow: int = 8,
    alpha: float = 0.5,
) -> None:
    """Overlay: prediction → red channel, ground truth → blue channel
    (reference color scheme, `pytorch_datasets.py:327-373`)."""
    import cv2

    if images.ndim == 3:
        images = images[..., None]
    gray = _normalize_to_uint8(images).astype(np.float32)
    rgb = np.repeat(gray, 3, axis=-1)
    pred = np.asarray(pred_masks, np.float32).reshape(pred_masks.shape[0], *pred_masks.shape[1:3], -1)[..., :1]
    true = np.asarray(masks, np.float32).reshape(masks.shape[0], *masks.shape[1:3], -1)[..., :1]
    # BGR (cv2): blue=idx0 ground truth, red=idx2 prediction
    rgb[..., 2:3] = np.where(pred > 0.5, (1 - alpha) * rgb[..., 2:3] + alpha * 255.0, rgb[..., 2:3])
    rgb[..., 0:1] = np.where(true > 0.5, (1 - alpha) * rgb[..., 0:1] + alpha * 255.0, rgb[..., 0:1])
    grid = _to_grid(rgb.astype(np.uint8), nrow)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, grid)


def print_batch_stats(name: str, arr: np.ndarray, file=sys.stderr) -> None:
    arr = np.asarray(arr)
    print(
        f"{name}: shape={arr.shape} dtype={arr.dtype} "
        f"min={arr.min():.4f} max={arr.max():.4f} mean={arr.mean():.4f} std={arr.std():.4f}",
        file=file,
    )
