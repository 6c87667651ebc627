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


def _edge_argmax(vals, entry, entry_val, make_cand):
    """Scan one image edge (vals = a STATIC row/col slice of the distance
    transform — a dynamic dt[coords] gather lowers to a serial loop on TPU)
    for the max value, strict-> so earlier pixels win ties (reference scan
    order).  Carries the current entry's value so no dynamic lookup is ever
    needed."""
    vmax = jnp.max(vals)
    best = jnp.argmax(vals)        # first max: earlier pixels win ties
    better = vmax > entry_val
    cand = make_cand(best)
    return (jnp.where(better, cand, entry),
            jnp.where(better, vmax, entry_val))


def hand_segment_vr(depth, cam: DCamera, entry_options: int = 0xF,
                    wrange=(0.1, 0.7), diam: float = 0.17) -> SegmentResult:
    H, W = depth.shape
    assert (W, H) == cam.dim, (cam.dim, depth.shape)
    small = downsample_min(downsample_min(depth))
    scam = cam.sub(4)
    sh, sw = small.shape

    wy = (jnp.asarray(wrange[1]) / cam.depth_scale).astype(jnp.uint16)
    dt = distance_transform(threshold(small, hi=wy)).astype(jnp.int32)

    # entry point (handtrack.h:289-293); scan order: bottom, top, right,
    # left.  Every edge is a STATIC slice of dt and every candidate is
    # reconstructed arithmetically — zero dynamic gathers.
    if entry_options == 1:
        entry = jnp.asarray([sw // 2, sh - 1])
        entry_val = dt[sh - 1, sw // 2]
    elif entry_options == 4:
        entry = jnp.asarray([sw - 1, sh // 2])
        entry_val = dt[sh // 2, sw - 1]
    elif entry_options == 8:
        entry = jnp.asarray([0, sh // 2])
        entry_val = dt[sh // 2, 0]
    else:
        entry = jnp.asarray([0, 0])
        entry_val = dt[0, 0]
    edges = [
        (entry_options & 1, dt[sh - 1, :],
         lambda b: jnp.stack([b, jnp.full_like(b, sh - 1)])),
        (entry_options & 2, dt[0, :],
         lambda b: jnp.stack([b, jnp.zeros_like(b)])),
        (entry_options & 4, dt[:, sw - 1],
         lambda b: jnp.stack([jnp.full_like(b, sw - 1), b])),
        (entry_options & 8, dt[:, 0],
         lambda b: jnp.stack([jnp.zeros_like(b), b])),
    ]
    for bit, vals, make_cand in edges:
        if bit:
            entry, entry_val = _edge_argmax(vals, entry, entry_val,
                                            make_cand)

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
    eidx = jnp.argmax(along)       # row-major flat index -> coords by
    ex = (eidx % sw).astype(jnp.float32)   # arithmetic (no dynamic gather)
    ey = (eidx // sw).astype(jnp.float32)
    extreme = jnp.where(has_blob, jnp.stack([ex, ey]), entf)

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
