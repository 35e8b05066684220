"""Save a batch of images as a PNG grid (replaces torchvision make_grid /
save_image used at reference cvivit_trainer.py:316-324)."""

from __future__ import annotations

import math

import numpy as np
from PIL import Image


def make_image_grid(images: np.ndarray, nrow: int = 8, padding: int = 2) -> np.ndarray:
    """images: (n, H, W, c) float [0,1] -> grid (H', W', c)."""
    n, H, W, c = images.shape
    ncol = nrow
    nrows = math.ceil(n / ncol)
    grid = np.zeros(
        (nrows * (H + padding) + padding, ncol * (W + padding) + padding, c),
        np.float32,
    )
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y = r * (H + padding) + padding
        x = col * (W + padding) + padding
        grid[y : y + H, x : x + W] = images[idx]
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    grid = make_image_grid(np.asarray(images, np.float32), nrow=nrow)
    arr = np.clip(grid * 255.0, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
