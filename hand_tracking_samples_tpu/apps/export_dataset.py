"""dataset-exporter equivalent: batch offline export of a recording.

Writes PNGs (full/segment depth + IR, debug overlays, heatmaps) and
labels_full.txt / labels_seg.txt exactly like dataexporter.cpp:32-123 —
the pure load->process->write throughput-mode app.

    python -m hand_tracking_samples_tpu.apps.export_dataset rec.rs --out tmp/
"""
from __future__ import annotations

import argparse

from ..assets_paths import DEFAULT_ANIMBANK, DEFAULT_MODEL_JSON
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
import jax.tree_util as jtu


def main(argv=None):
    from ..utils.platform import select_platform
    select_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("recordings", nargs="+")
    ap.add_argument("--model", default=DEFAULT_MODEL_JSON)
    ap.add_argument("--out", default="tmp")
    ap.add_argument("--drange", type=float, nargs=2, default=(0.20, 0.70))
    ap.add_argument("--max-frames", type=int, default=0)
    args = ap.parse_args(argv)

    from ..cnn.labels import gather_hand_expected, image_feature_points
    from ..data.dataset import load_dataset
    from ..imaging.camera import DCamera
    from ..maths.pose import pose_apply, pose_inverse, pose_mul
    from ..maths.quat import qrot
    from ..model.bake import FEATURE_BONES, FEATURE_OFFSETS, load_hand_model
    from ..segment.handsegment import cnn_input_from_segment, hand_segment_vr
    from ..utils.viz import draw_points, to_grayscale_rgb, write_png

    model = jtu.tree_map(jnp.asarray, load_hand_model(args.model))
    os.makedirs(args.out, exist_ok=True)
    labels_full = open(os.path.join(args.out, "labels_full.txt"), "w")
    labels_seg = open(os.path.join(args.out, "labels_seg.txt"), "w")
    drange = tuple(args.drange)

    @jax.jit
    def process(depth, pose, cam: DCamera):
        fp = jnp.clip(1.0 - (depth.astype(jnp.float32) * cam.depth_scale
                             - drange[0]) / (drange[1] - drange[0]), 0.0, 1.0)
        # bbox of all bone verts projected into the full image
        verts_w = jax.vmap(
            lambda b: pose[b, :3] + qrot(pose[b, 3:7], model.verts[b]))(
                jnp.arange(1, 17))
        px = cam.projectz(verts_w.reshape(-1, 3))
        vm = model.vert_mask[1:].reshape(-1)
        bmin = jnp.min(jnp.where(vm[:, None], px, jnp.inf), axis=0)
        bmax = jnp.max(jnp.where(vm[:, None], px, -jnp.inf), axis=0)
        bmin = jnp.maximum(bmin.astype(jnp.int32), 0)
        bmax = jnp.minimum(bmax.astype(jnp.int32),
                           jnp.asarray([cam.dim[0] - 1, cam.dim[1] - 1]))
        # landmarks in the full image
        fpts_w = pose_apply(pose[jnp.asarray(FEATURE_BONES)],
                            jnp.asarray(FEATURE_OFFSETS))
        fpx = cam.projectz(fpts_w).astype(jnp.int32)
        fpx = jnp.clip(fpx, 0, jnp.asarray([cam.dim[0] - 1, cam.dim[1] - 1]))
        # segment + segment-frame labels
        seg = hand_segment_vr(depth, cam, 0xF, drange, 0.17)
        x = cnn_input_from_segment(seg.depth, cam.depth_scale, drange)
        inv = pose_inverse(seg.cam.pose)
        pose_seg = jax.vmap(lambda p: pose_mul(inv, p))(pose)
        seg_cam = seg.cam._replace(pose=jnp.zeros(7).at[6].set(1.0))
        seg_pts = image_feature_points(pose_seg, seg_cam)
        labels, _, vals = gather_hand_expected(pose_seg, seg_cam.sub(4))
        return fp, bmin, bmax, fpx, x, seg_pts, labels, vals

    k = 0
    for rec in args.recordings:
        bname = rec[:-3] if rec.endswith(".rs") else rec
        ds = load_dataset(bname)
        cam = ds.info.camera()
        F = len(ds.depth) if not args.max_frames else min(args.max_frames,
                                                          len(ds.depth))
        for f in range(F):
            fp, bmin, bmax, fpx, x, seg_pts, labels, vals = process(
                jnp.asarray(ds.depth[f]), jnp.asarray(ds.pose[f]), cam)
            full = to_grayscale_rgb(np.asarray(fp))
            write_png(f"{args.out}/full_depth_{k}.png", full)
            if ds.ir is not None:
                write_png(f"{args.out}/full_ir_{k}.png",
                          to_grayscale_rgb(ds.ir[f]))
            dbg = draw_points(full, np.asarray(fpx), size=2)
            b0, b1 = np.asarray(bmin), np.asarray(bmax)
            dbg[b0[1]:b1[1] + 1, [b0[0], b1[0]]] = (128, 0, 0)
            dbg[[b0[1], b1[1]], b0[0]:b1[0] + 1] = (128, 0, 0)
            write_png(f"{args.out}/debug_depth_{k}.png", dbg)
            seg_rgb = to_grayscale_rgb(np.asarray(x))
            write_png(f"{args.out}/segment_depth_{k}.png", seg_rgb)
            write_png(f"{args.out}/debug_segdepth_{k}.png",
                      draw_points(seg_rgb, np.asarray(seg_pts)))
            hm = np.asarray(labels).reshape(-1)[:2048].reshape(8, 16, 16)
            vm = np.asarray(labels).reshape(-1)[2048:].reshape(16, 16)
            sheet = np.concatenate(list(hm) + [vm], axis=0)
            write_png(f"{args.out}/heatmaps_{k}.png",
                      to_grayscale_rgb(sheet / max(sheet.max(), 1e-6)))

            labels_full.write(f"{k}  {b0[0]} {b0[1]}  {b1[0]} {b1[1]}   ")
            for p in np.asarray(fpx):
                labels_full.write(f"{p[0]} {p[1]} ")
            labels_seg.write(f"{k}  ")
            for p in np.asarray(seg_pts):
                labels_seg.write(f"{p[0]:g} {p[1]:g}  ")
            for v in np.asarray(vals):
                labels_seg.write(f"{v:g} ")
                labels_full.write(f"{v:g} ")
            labels_full.write("\n")
            labels_seg.write("\n")
            k += 1
        print(f"{bname}: exported {F} frames")
    labels_full.close()
    labels_seg.close()
    print(f"done: {k} frames -> {args.out}/")


if __name__ == "__main__":
    sys.exit(main())
