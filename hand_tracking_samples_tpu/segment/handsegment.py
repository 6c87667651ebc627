"""Hand segmentation: wrist-entry detection + aligned 64x64 depth crop.

TPU rewrite of HandSegmentVR (include/handtrack.h:269-344): 2x DownSampleMin,
threshold + Manhattan distance transform, entry-point scan over the selected
image edges, distance-weighted centroid/average-depth, in-plane rotation that
aligns the hand with the vertical axis, scale-by-depth virtual camera, and a
depth-corrected resample (SampleD).

All steps are reductions/gathers over static shapes — one fused XLA program;
no data-dependent control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..imaging.camera import DCamera
from ..imaging.image_ops import (distance_transform, downsample_min, sample_d,
                                 threshold)
from ..maths.quat import qmul, quat_from_axis_angle, quat_from_to

MIN_BLOB_RADIUS = 2  # handtrack.h:299


class SegmentResult(NamedTuple):
    depth: jnp.ndarray   # (64, 64) uint16, distances re-measured to dst plane
    cam: DCamera         # virtual camera (pose = in-plane rotation)
    valid: jnp.ndarray   # bool: blob found


def _edge_argmax(dt, entry, mask_bit, coords):
    """Scan one image edge for the max distance-transform value, strict->
    so earlier pixels win ties (reference scan order)."""
    vals = dt[coords[:, 1], coords[:, 0]]
    best = jnp.argmax(vals)
    cand = coords[best]
    better = vals[best] > dt[entry[1], entry[0]]
    return jnp.where(mask_bit & better, cand, entry)


def hand_segment_vr(depth, cam: DCamera, entry_options: int = 0xF,
                    wrange=(0.1, 0.7), diam: float = 0.17) -> SegmentResult:
    H, W = depth.shape
    assert (W, H) == cam.dim, (cam.dim, depth.shape)
    small = downsample_min(downsample_min(depth))
    scam = cam.sub(4)
    sh, sw = small.shape

    wy = (jnp.asarray(wrange[1]) / cam.depth_scale).astype(jnp.uint16)
    dt = distance_transform(threshold(small, hi=wy)).astype(jnp.int32)

    # entry point (handtrack.h:289-293); scan order: bottom, top, right, left
    if entry_options == 1:
        entry = jnp.asarray([sw // 2, sh - 1])
    elif entry_options == 4:
        entry = jnp.asarray([sw - 1, sh // 2])
    elif entry_options == 8:
        entry = jnp.asarray([0, sh // 2])
    else:
        entry = jnp.asarray([0, 0])
    xs = jnp.arange(sw)
    ys = jnp.arange(sh)
    edges = [
        (entry_options & 1, jnp.stack([xs, jnp.full(sw, sh - 1)], 1)),
        (entry_options & 2, jnp.stack([xs, jnp.zeros(sw, jnp.int32)], 1)),
        (entry_options & 4, jnp.stack([jnp.full(sh, sw - 1), ys], 1)),
        (entry_options & 8, jnp.stack([jnp.zeros(sh, jnp.int32), ys], 1)),
    ]
    for bit, coords in edges:
        if bit:
            entry = _edge_argmax(dt, entry, True, coords)

    # weighted centroid / avg depth over blob pixels (handtrack.h:295-315)
    gy, gx = jnp.meshgrid(jnp.arange(sh, dtype=jnp.float32),
                          jnp.arange(sw, dtype=jnp.float32), indexing="ij")
    blob = dt >= MIN_BLOB_RADIUS
    wdist = jnp.sqrt((gx - entry[0]) ** 2 + (gy - entry[1]) ** 2) + 1e-5
    w = jnp.where(blob, wdist, 0.0)
    wtotal = w.sum()
    count = blob.sum()
    com = jnp.stack([(w * gx).sum(), (w * gy).sum()]) / jnp.maximum(wtotal, 1e-20)
    avgdepth = (w * small.astype(jnp.float32)).sum() \
        * cam.depth_scale / jnp.maximum(wtotal, 1e-20)
    ok = (count > 0) & (wtotal > 0.0)
    com = jnp.where(ok, com, entry.astype(jnp.float32))
    avgdepth = jnp.where(ok, avgdepth, 0.0)

    # extreme point along entry->com (handtrack.h:317-322)
    entf = entry.astype(jnp.float32)
    along = (gx - entf[0]) * (com[0] - entf[0]) + (gy - entf[1]) * (com[1] - entf[1])
    along = jnp.where(blob, along, -jnp.inf)
    has_blob = jnp.any(blob)
    eidx = jnp.argmax(along)
    extreme = jnp.where(has_blob,
                        jnp.stack([gx.reshape(-1)[eidx], gy.reshape(-1)[eidx]]),
                        entf)

    avgdepth = jnp.clip(avgdepth, 0.20, 1.0)
    valid = ok & jnp.any(com != entf)
    angle = jnp.where(valid, jnp.arctan2(com[0] - entf[0], entf[1] - com[1]), 0.0)
    comdir = com - entf
    comdir = comdir / jnp.maximum(jnp.linalg.norm(comdir), 1e-20)
    exrad = jnp.dot(extreme - com, comdir)
    shift = comdir * (exrad - diam / 2.0 / avgdepth * scam.focal[0])
    com = jnp.where(valid, com + shift, com)

    # virtual 64x64 camera (handtrack.h:336-341)
    focal = avgdepth * 64.0 / diam
    dstcam = DCamera.make((64, 64), (focal, focal), (32.0, 32.0),
                          cam.depth_scale)
    q = qmul(
        quat_from_to(scam.deprojectz(scam.principal, jnp.float32(1.0)),
                     scam.deprojectz(com, jnp.float32(1.0))),
        quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), angle))
    pose = jnp.concatenate([jnp.zeros(3), q])
    dstcam = dstcam._replace(pose=pose)

    bg = (4.0 / cam.depth_scale).astype(depth.dtype) if hasattr(cam.depth_scale, "astype") \
        else depth.dtype.type(4.0 / cam.depth_scale)
    seg = sample_d(depth, cam, dstcam, (4.0 / cam.depth_scale).astype(jnp.uint16)
                   if depth.dtype == jnp.uint16 else bg)
    return SegmentResult(depth=seg, cam=dstcam, valid=valid)


def cnn_input_from_segment(seg_depth, depth_scale, drange=(0.1, 0.7)):
    """handtrack.h:700: inverse-depth normalisation to [0,1] float."""
    d = seg_depth.astype(jnp.float32) * depth_scale
    return jnp.clip(1.0 - (d - drange[0]) / (drange[1] - drange[0]), 0.0, 1.0)
