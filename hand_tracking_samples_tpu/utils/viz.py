"""Offline visualization artifacts (replacing the reference's GL windows).

The reference apps render live; on TPU the equivalent observability story is
PNG dumps (à la dataset-exporter) of depth frames, segments, heatmaps and
landmark overlays.
"""
from __future__ import annotations

import os

import numpy as np

RAINBOW = np.array([
    [0.75, 0.5, 0.5], [0.5, 0.75, 0.5], [0.5, 0.5, 0.75], [1, 0, 0],
    [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1]])  # handtrack.h:74


def to_grayscale_rgb(x):
    """float [0,1] or uint8 (H,W) -> (H,W,3) uint8."""
    x = np.asarray(x)
    if x.dtype != np.uint8:
        x = np.clip(x * 255.0, 0, 255).astype(np.uint8)
    return np.repeat(x[..., None], 3, axis=-1)


def depth_to_rgb(depth, depth_scale=0.001, drange=(0.1, 0.7)):
    d = np.asarray(depth).astype(np.float32) * depth_scale
    x = np.clip(1.0 - (d - drange[0]) / (drange[1] - drange[0]), 0.0, 1.0)
    return to_grayscale_rgb(x)


def draw_points(img, pts, colors=None, size=1):
    """Plot landmark pixels (rainbow by default) into an (H,W,3) image."""
    img = np.array(img)
    h, w = img.shape[:2]
    for i, p in enumerate(np.asarray(pts)):
        x, y = int(p[0]), int(p[1])
        c = (RAINBOW[i % len(RAINBOW)] * 255).astype(np.uint8) \
            if colors is None else colors[i]
        x0, x1 = max(0, x - size + 1), min(w, x + size)
        y0, y1 = max(0, y - size + 1), min(h, y + size)
        if x0 < x1 and y0 < y1:
            img[y0:y1, x0:x1] = c
    return img


def write_png(path, img):
    from PIL import Image
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = to_grayscale_rgb(arr)
    Image.fromarray(arr).save(path)


def concat_heatmaps(hmaps):
    """Stack heatmaps vertically like ImageConcat (misc_image.h:225)."""
    return np.concatenate([np.asarray(h) for h in hmaps], axis=0)
