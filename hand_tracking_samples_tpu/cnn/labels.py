"""CNN label generation and output decoding.

The training-label side (GatherHandExpectedCNN, include/handtrack.h:152-173)
renders the ground-truth pose into the 8 landmark heatmaps + 16 1-D angle
maps; the inference side (CNNOutputAnalysis, handtrack.h:176-242) decodes the
2304 network outputs into landmark rays, sub-pixel image points, confidences
and key angles.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..imaging.camera import DCamera
from ..imaging.heatmaps import (image_find_max, peak_subpixel, peak_volume,
                                peaks_1d, render_1d_heatmaps, render_heatmaps)
from ..maths.pose import pose_apply, pose_inverse, pose_quat
from ..maths.quat import qmul, qnormalize, quat_from_axis_angle, qxdir, qydir, qzdir
from ..model.bake import FEATURE_BONES, FEATURE_OFFSETS
from .model import HM, KEY_ANGLES, N_HEATMAPS

PI = 3.14159  # the reference consistently uses this truncation


def skin_feature_points(poses):
    """handtrack.h:82-84 Skin: world positions of the 8 model landmarks.
    poses: (17, 7) bone poses (physics COM frame is NOT what the reference
    uses here — it skins with the plain bone poses, which for the palm/tips
    offsets are the physics poses of GetPose())."""
    bone_poses = poses[jnp.asarray(FEATURE_BONES)]
    return pose_apply(bone_poses, jnp.asarray(FEATURE_OFFSETS))


def image_feature_points(poses, hcam: DCamera):
    """handtrack.h:92-96: project the landmarks into heatmap pixels."""
    pts = skin_feature_points(poses)
    local = pose_apply(pose_inverse(hcam.pose), pts)
    return hcam.projectz(local)


def hand_pose_to_key_angle_set(poses, reference_frame):
    """handtrack.h:133-150: 9 scalar labels in [0,1], padded to 16."""
    palmq = qmul(pose_quat(pose_inverse(reference_frame)), poses[1, 3:7])
    px = qxdir(palmq)
    pz = qzdir(palmq)
    vals = [
        jnp.arctan2(px[0], -px[2]) / (PI * 2.0) + 0.5,                    # roll
        jnp.arcsin(jnp.clip(pz[2], -1.0, 1.0)) / PI + 0.5,                # pitch
        jnp.arcsin(jnp.clip(pz[0], -1.0, 1.0)) / PI + 0.5,                # tilt
        jnp.arccos(jnp.sum(qxdir(poses[1, 3:7]) * qzdir(poses[4, 3:7]))) / PI,
    ]
    for bid in (6, 9, 12, 15):  # finger curls
        vals.append(jnp.arccos(jnp.clip(
            jnp.sum(qydir(poses[1, 3:7]) * qydir(poses[bid, 3:7])),
            -1.0, 1.0)) / PI)
    vals.append(0.5 + jnp.arctan2(-pz[0], -pz[1]) / (PI * 2.0))           # arm dir
    vals += [jnp.float32(0.0)] * (KEY_ANGLES - len(vals))
    return jnp.stack(vals)


def gather_hand_expected(poses, hcam: DCamera):
    """GatherHandExpectedCNN (handtrack.h:160-173): the 2304-float target."""
    fp = image_feature_points(poses, hcam)
    hmaps = render_heatmaps(fp, (HM, HM))                  # (8, 16, 16) uint8
    vals = hand_pose_to_key_angle_set(poses, hcam.pose)
    vmap = render_1d_heatmaps(vals, HM)                    # (16, 16) uint8
    expected = jnp.concatenate([
        hmaps.reshape(-1).astype(jnp.float32) / 255.0,
        vmap.reshape(-1).astype(jnp.float32) / 255.0,
    ])
    return expected, fp, vals


class CNNAnalysis(NamedTuple):
    """Decoded network output (CNNOutputAnalysis, handtrack.h:182-242)."""
    crays: jnp.ndarray          # (8, 4) world ray dirs + peak value
    image_points: jnp.ndarray   # (8, 2) sub-pixel heatmap peaks
    confidence: jnp.ndarray     # (8,)
    vals: jnp.ndarray           # (16,) decoded 1-D values
    wristroll: jnp.ndarray
    pitch: jnp.ndarray
    tilt: jnp.ndarray
    palmq: jnp.ndarray          # (4,)
    finger_clenched: jnp.ndarray  # (5,) 0 open .. pi clenched


def analyze_cnn_output(cnn_output, hcam: DCamera) -> CNNAnalysis:
    """cnn_output: (2304,) post-softmax floats; hcam the 16x16 heatmap cam.

    The 8 heatmaps are decoded on their FLAT (8, 256) layout — identical
    raster-order semantics to the per-map 2-D form (ImageFindMax's first
    strict maximum is the flat argmax; the window masks compare the same
    x/y coordinates), but the minor axis stays lane-dense under the tracks
    vmap instead of padding 16 -> 128."""
    hmf = cnn_output[: N_HEATMAPS * HM * HM].reshape(N_HEATMAPS, HM * HM)
    iota = jnp.arange(HM * HM, dtype=jnp.int32)
    xs = iota % HM                                        # (256,)
    ys = iota // HM
    idx = jnp.argmax(hmf, axis=-1).astype(jnp.int32)      # (8,) first max
    px = (idx % HM)[:, None]
    py = (idx // HM)[:, None]
    # PeakSubPixel (misc_image.h:313-326), window r=1 clamped
    inwin = ((xs[None] >= jnp.maximum(0, px - 1))
             & (xs[None] < jnp.minimum(HM, px + 2))
             & (ys[None] >= jnp.maximum(0, py - 1))
             & (ys[None] < jnp.minimum(HM, py + 2)))
    w = jnp.where(inwin, hmf, 0.0)
    wsum = w.sum(-1)
    cx = (w * xs).sum(-1) / jnp.maximum(wsum, 1e-30)
    cy = (w * ys).sum(-1) / jnp.maximum(wsum, 1e-30)
    zero_w = wsum == 0
    image_points = jnp.stack(
        [jnp.where(zero_w, px[:, 0].astype(jnp.float32), cx),
         jnp.where(zero_w, py[:, 0].astype(jnp.float32), cy)], axis=-1)
    # PeakVolume (misc_image.h:328-336) around round(subpixel peak)
    vx = (image_points[:, 0] + 0.5).astype(jnp.int32)[:, None]
    vy = (image_points[:, 1] + 0.5).astype(jnp.int32)[:, None]
    vwin = ((xs[None] >= jnp.maximum(0, vx - 1))
            & (xs[None] < jnp.minimum(HM, vx + 2))
            & (ys[None] >= jnp.maximum(0, vy - 1))
            & (ys[None] < jnp.minimum(HM, vy + 2)))
    confidence = jnp.where(vwin, hmf, 0.0).sum(-1)
    n = pose_apply(hcam.pose, hcam.deprojectz(image_points,
                                              jnp.float32(1.0)))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    peakval = hmf.max(-1)     # value at the first argmax == the max
    crays = jnp.concatenate([n, peakval[:, None]], axis=-1)

    vmap_img = cnn_output[N_HEATMAPS * HM * HM:].reshape(KEY_ANGLES, HM)
    vals = peaks_1d(vmap_img)

    # calc_angles uses 3.1415 while the label side uses 3.14159
    # (handtrack.h:196-201 vs :139-146) — matched digit for digit.
    PI4 = 3.1415
    wristroll = vals[0] * PI4 * 2.0 + PI4 / 2.0
    pitch = (vals[1] - 0.5) * PI4
    tilt = (vals[2] - 0.5) * PI4
    palmq = qmul(
        qnormalize(jnp.asarray([1.0, 0.0, 0.0, 1.0])),
        qmul(quat_from_axis_angle(jnp.asarray([-1.0, 0.0, 0.0]), pitch),
             quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), wristroll)))
    finger_clenched = vals[3:8] * PI4
    return CNNAnalysis(crays, image_points, confidence, vals,
                       wristroll, pitch, tilt, palmq, finger_clenched)
