"""Heatmap render/decode codec (include/misc_image.h:241-399).

The CNN's label side renders uint8 Gaussian splats normalised to unit volume
(sum 255 in byte space); the decode side finds peaks, weighted sub-pixel
locations, and peak volumes.  Byte-exact with the reference (including the
integer normalisation's rounding) so that trained weights transfer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_grayscale(x):
    return jnp.clip(x * 255.0, 0.0, 255.0).astype(jnp.uint8)


def render_heatmap(peak, dim=(16, 16)):
    """RenderHeatMap (misc_image.h:259-270): 5x5 gaussian splat around the
    truncated peak, then integer volume normalisation to sum 255.
    peak: (2,) float. Returns (H, W) uint8."""
    W, H = dim
    hp = peak.astype(jnp.int32)  # C truncation
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    inwin = ((xs >= jnp.maximum(0, hp[0] - 2)) & (xs < jnp.minimum(W, hp[0] + 3))
             & (ys >= jnp.maximum(0, hp[1] - 2)) & (ys < jnp.minimum(H, hp[1] + 3)))
    d2 = (peak[0] - xs) ** 2 + (peak[1] - ys) ** 2
    g = _to_grayscale(jnp.exp(-d2 / (2.0 * 0.33)))
    img = jnp.where(inwin, g, jnp.uint8(0)).astype(jnp.int32)
    s = img.sum()
    img = jnp.where(s > 0, img * 255 // jnp.maximum(s, 1), img)
    return img.astype(jnp.uint8)


def render_heatmaps(peaks, dim=(16, 16)):
    return jax.vmap(lambda p: render_heatmap(p, dim))(peaks)


def render_1d_heatmaps(values, width: int = 16):
    """Render1DHeatMaps (misc_image.h:279-295): one row per value; gaussian
    of std 0.5 around v*(width-1), row-normalised to sum 255 over the 5-tap
    window."""
    def row(v):
        vv = v * (width - 1)
        x = jnp.arange(width)
        lo = jnp.maximum(0, vv.astype(jnp.int32) - 2)
        hi = jnp.minimum(width, vv.astype(jnp.int32) + 3)
        inwin = (x >= lo) & (x < hi)
        g = _to_grayscale(jnp.exp(-((x - vv) ** 2) / (2.0 * 0.5)))
        r = jnp.where(inwin, g, jnp.uint8(0)).astype(jnp.int32)
        s = r.sum()
        r = jnp.where((s > 0) & inwin, r * 255 // jnp.maximum(s, 1), r)
        return r.astype(jnp.uint8)

    return jax.vmap(row)(jnp.asarray(values))


def image_find_max(img):
    """ImageFindMax (misc_image.h:298): first strict maximum in raster order.
    Returns (x, y) int32."""
    flat = img.reshape(-1)
    idx = jnp.argmax(flat)  # argmax returns first max; matches `>` scan
    W = img.shape[1]
    return jnp.stack([idx % W, idx // W]).astype(jnp.int32)


def peak_subpixel(img, p, r: int = 1):
    """PeakSubPixel (misc_image.h:313-326): weighted centroid over the
    (2r+1)^2 window clamped to the image."""
    H, W = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    inwin = ((xs >= jnp.maximum(0, p[0] - r)) & (xs < jnp.minimum(W, p[0] + r + 1))
             & (ys >= jnp.maximum(0, p[1] - r)) & (ys < jnp.minimum(H, p[1] + r + 1)))
    w = jnp.where(inwin, img.astype(jnp.float32), 0.0)
    wsum = w.sum()
    cx = (w * xs).sum() / jnp.maximum(wsum, 1e-30)
    cy = (w * ys).sum() / jnp.maximum(wsum, 1e-30)
    return jnp.where(wsum == 0, p.astype(jnp.float32), jnp.stack([cx, cy]))


def peak_volume(img, pf, r: int = 1):
    """PeakVolume (misc_image.h:328-336): sum over window around round(pf)."""
    p = (pf + 0.5).astype(jnp.int32)
    H, W = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    inwin = ((xs >= jnp.maximum(0, p[0] - r)) & (xs < jnp.minimum(W, p[0] + r + 1))
             & (ys >= jnp.maximum(0, p[1] - r)) & (ys < jnp.minimum(H, p[1] + r + 1)))
    return jnp.where(inwin, img.astype(jnp.float32), 0.0).sum()


def peaks_1d(img):
    """Peaks1D (misc_image.h:390-399): per-row argmax + 1D weighted sub-pixel
    normalised by (width-1)."""
    H, W = img.shape

    def row(r):
        p = jnp.argmax(r)
        x = jnp.arange(W)
        inwin = (x >= jnp.maximum(0, p - 1)) & (x < jnp.minimum(W, p + 2))
        w = jnp.where(inwin, r.astype(jnp.float32), 0.0)
        wsum = w.sum()
        v = (w * x).sum() / jnp.maximum(wsum, 1e-30)
        return jnp.where(wsum == 0, p.astype(jnp.float32), v) / (W - 1)

    return jax.vmap(row)(img)
