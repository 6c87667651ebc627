"""realtime-annotator / annotation-fixer equivalent: batch auto-labeling.

The reference's annotator captures frames live and runs `slowfit` per frame
to produce ground-truth poses (realtime-annotator.cpp:112-175); the fixer
re-simulates fits over a recorded dataset (annotation-fixer.cpp:70).  This
CLI is the offline composition of both: kickstart on the first frames, then
slowfit every frame with optional hold mode, writing the refined poses back
out in the dataset format.

    python -m hand_tracking_samples_tpu.apps.annotate rec.rs --out rec_fit
"""
from __future__ import annotations

import argparse

from ..assets_paths import DEFAULT_CNNB, DEFAULT_ANIMBANK, DEFAULT_MODEL_JSON
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
    ap.add_argument("--cnnb", default=None, help=".cnnb weights (default: shipped trained net)")
    ap.add_argument("--out", default=None, help="basename for refined output")
    ap.add_argument("--hold", type=int, default=0, choices=[0, 1, 2],
                    help="hold relative finger pose (occluded captures)")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--kickstart", type=int, default=5,
                    help="CNN kickstart frames before slowfitting")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--revert-worse", action="store_true",
                    help="per-frame accept/revert: keep the original "
                    "annotation when the refit's fit error is worse (the "
                    "annotation-fixer's per-frame startpose undo, "
                    "annotation-fixer.cpp:152-158, as a batch policy)")
    ap.add_argument("--delete-frames", default="",
                    help="comma-separated frame indices to drop from the "
                    "output (the fixer's frame-delete)")
    ap.add_argument("--inspect", action="store_true",
                    help="print per-frame fit errors (old vs refit) and exit "
                    "without writing")
    ap.add_argument("--edits", default=None,
                    help="per-frame edit commands JSON (exported by the HTML "
                    "report's editor, utils/report.py): the annotation-"
                    "fixer's interactive loop (annotation-fixer.cpp:219-260) "
                    "offline.  Schema: {\"edits\": [{\"frame\": F, \"bone\": "
                    "B, \"nail\": [x,y,z]} | {\"frame\": F, \"hold\": 0|1|2} "
                    "| {\"frame\": F, \"delete\": true}]}")
    ap.add_argument("--dump-artifacts", default=None,
                    help="dir for per-frame overlay PNGs + posed OBJs + bone "
                    "origins (bones_NNNN.json) + the HTML report with the "
                    "edit panel")
    args = ap.parse_args(argv)

    from ..cnn.model import load_cnnb
    from ..data.dataset import DatasetWriter, load_dataset
    from ..fitting.cloud import fit_error
    from ..imaging.image_ops import compact_points, point_cloud
    from ..model.bake import load_hand_model
    from ..tracker.config import TrackerConfig
    from ..tracker.runtime import (kickstart, make_tracker_state,
                                   physics_params, slowfit)

    on_tpu = jax.devices()[0].platform != "cpu"
    model = jtu.tree_map(jnp.asarray, load_hand_model(args.model))
    config = TrackerConfig(point_budget=2048, solver="sequential",
                           use_pallas=False)
    params = physics_params(config)
    cnn_params = load_cnnb(args.cnnb or DEFAULT_CNNB)

    for rec in args.recordings:
        bname = rec[:-3] if rec.endswith(".rs") else rec
        ds = load_dataset(bname)
        if ds.info.mirror_plane():
            import dataclasses
            config = dataclasses.replace(
                config, mirror_plane=ds.info.mirror_plane())
            print(f"mirror rig: applying MirrorPlaneSplit {ds.info.mplane}")
        cam = ds.info.camera()
        F = len(ds.depth) if not args.max_frames else min(args.max_frames,
                                                          len(ds.depth))
        state = make_tracker_state(model)
        if np.abs(ds.pose).sum() > 0:  # refine existing annotations
            state = state._replace(body=state.body._replace(
                pose=jnp.asarray(ds.pose[0])))
            do_kickstart = 0
        else:
            do_kickstart = args.kickstart

        ks = jax.jit(lambda s, d: kickstart(s, model, cnn_params, d, cam,
                                            config, params)[0])

        def points_of(depth):
            pts_all, mask_all = point_cloud(depth, cam, 0.1, 0.6)
            sub = mask_all & ((jnp.cumsum(mask_all) - 1) % 4 == 0)
            return compact_points(pts_all, sub, config.point_budget)

        # slowfit variants: hold level and a dragged-bone nail are trace-time
        # structure (annotation-fixer.cpp:219-260), so jit one fn per variant
        _sf_cache = {}

        def sf(state, pts, mask, ref, hold=args.hold, nail=None):
            key = (hold, None if nail is None else int(nail[0]))
            if key not in _sf_cache:
                if key[1] is None:
                    _sf_cache[key] = jax.jit(
                        lambda s, p, m, r: slowfit(
                            s, model, p, m, config, params, hold=hold,
                            refpose=r, steps=args.steps))
                else:
                    _sf_cache[key] = jax.jit(
                        lambda s, p, m, r, sp: slowfit(
                            s, model, p, m, config, params, hold=hold,
                            refpose=r, steps=args.steps,
                            select_bone=key[1], spoint=sp,
                            rbpoint=jnp.zeros(3, jnp.float32)))
            if key[1] is None:
                return _sf_cache[key](state, pts, mask, ref)
            return _sf_cache[key](state, pts, mask, ref,
                                  jnp.asarray(nail[1], jnp.float32))

        fe = jax.jit(lambda s, p, m, d: fit_error(s.body, model, p, m, d, cam))

        nails, holds, edit_deletes = {}, {}, set()
        if args.edits:
            import json as _json
            for e in _json.load(open(args.edits)).get("edits", []):
                f = int(e["frame"])
                if e.get("delete"):
                    edit_deletes.add(f)
                if "hold" in e:
                    holds[f] = int(e["hold"])
                if "nail" in e:
                    nails[f] = (int(e["bone"]),
                                [float(c) for c in e["nail"]])
            if nails or holds or edit_deletes:
                print(f"  edits: {len(nails)} nails, {len(holds)} holds, "
                      f"{len(edit_deletes)} deletes")

        out_poses = np.zeros((F, 17, 7), np.float32)
        errors, reverted = [], 0
        has_start = np.abs(ds.pose).sum() > 0
        refpose = jnp.asarray(ds.pose[0]) if has_start \
            else jnp.asarray(model.start_pose)
        for f in range(F):
            depth = jnp.asarray(ds.depth[f])
            if f < do_kickstart:
                state = ks(state, depth)
            pts, mask = points_of(depth)
            # startpose = the frame's existing annotation (dataset.h:44)
            startpose = ds.pose[f] if has_start else None
            state = sf(state, pts, mask, refpose,
                       hold=holds.get(f, args.hold), nail=nails.get(f))
            err_new = float(fe(state, pts, mask, depth))
            if (args.revert_worse or args.inspect) and startpose is not None:
                st_old = state._replace(body=state.body._replace(
                    pose=jnp.asarray(startpose)))
                err_old = float(fe(st_old, pts, mask, depth))
                if args.inspect:
                    print(f"  frame {f:4d}: old {err_old:.4f} "
                          f"refit {err_new:.4f}"
                          f"{'  (would revert)' if err_new > err_old else ''}")
                if args.revert_worse and err_new > err_old:
                    state = st_old      # per-frame undo: keep the annotation
                    err_new = err_old
                    reverted += 1
            out_poses[f] = np.asarray(state.body.pose)
            errors.append(err_new)
        print(f"{bname}: slowfit {F} frames, mean fit error "
              f"{np.mean(errors):.4f}"
              + (f", reverted {reverted}" if args.revert_worse else ""))
        if args.dump_artifacts:
            import json as _json
            import os
            os.makedirs(args.dump_artifacts, exist_ok=True)
            from ..utils.viz import depth_to_rgb, draw_points, write_png
            for f in range(F):
                img = depth_to_rgb(np.asarray(ds.depth[f]), cam.depth_scale)
                px = np.asarray(cam.projectz(
                    jnp.asarray(out_poses[f, :, :3])))
                img = draw_points(img, px, size=2)
                write_png(os.path.join(args.dump_artifacts,
                                       f"fit_{f:04d}.png"), img)
                with open(os.path.join(args.dump_artifacts,
                                       f"bones_{f:04d}.json"), "w") as bf:
                    _json.dump({"frame": f,
                                "bones": out_poses[f, :, :3].tolist()}, bf)
            from ..utils.report import write_html_report
            print("  report:", write_html_report(args.dump_artifacts))

        if args.out and not args.inspect:
            drop = {int(i) for i in args.delete_frames.split(",") if i}
            drop |= edit_deletes
            keep = [f for f in range(F) if f not in drop]
            with DatasetWriter(args.out, ds.info) as w:
                w.save_frames(ds.depth[keep], out_poses[keep],
                              None if ds.ir is None else ds.ir[keep])
            print(f"  wrote {args.out}.rs/.pose/.json ({len(keep)} frames"
                  + (f", dropped {sorted(drop)}" if drop else "") + ")")


if __name__ == "__main__":
    sys.exit(main())
