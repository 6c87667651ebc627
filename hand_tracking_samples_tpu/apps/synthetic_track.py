"""synthetic-hand-tracker equivalent: camera-free end-to-end tracking demo.

Animates a ground-truth hand from animbank.pose, ray-casts synthetic depth,
runs the tracker, and reports per-frame mean joint error vs ground truth —
the reference's entry-point regression harness (synthetic-tracker.cpp:85),
batched over independent tracks.

    python -m hand_tracking_samples_tpu.apps.synthetic_track \
        --animbank /root/reference/assets/animbank.pose --frames 64 --tracks 8
"""
from __future__ import annotations

import argparse

from ..assets_paths import DEFAULT_CNNB, DEFAULT_ANIMBANK, DEFAULT_MODEL_JSON
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import jax.tree_util as jtu


def main(argv=None):
    from ..utils.platform import select_platform
    select_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=DEFAULT_MODEL_JSON)
    ap.add_argument("--animbank", default=DEFAULT_ANIMBANK)
    ap.add_argument("--cnnb", default=None, help=".cnnb weights (optional)")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--tracks", type=int, default=4)
    ap.add_argument("--stride", type=int, default=1, help="animbank frame step")
    ap.add_argument("--dynamics-only", action="store_true",
                    help="skip the CNN path (BASELINE config 0)")
    ap.add_argument("--solver", default="colored",
                    choices=["colored", "sequential"])
    ap.add_argument("--pallas", action="store_true", default=None)
    ap.add_argument("--dump-png", default=None, help="dir for debug PNGs")
    ap.add_argument("--cold-start", action="store_true",
                    help="start from the rest pose (tests CNN acquisition)")
    args = ap.parse_args(argv)

    from ..cnn.model import load_cnnb
    from ..data.animbank import load_animbank
    from ..data.synth import fake_depth, synth_camera
    from ..model.bake import load_hand_model
    from ..parallel.tracks import batched_tracker_state, batched_update
    from ..tracker.config import TrackerConfig
    from ..tracker.runtime import physics_params

    on_tpu = jax.devices()[0].platform != "cpu"
    use_pallas = args.pallas if args.pallas is not None else on_tpu

    model = jtu.tree_map(jnp.asarray, load_hand_model(args.model))
    bank = load_animbank(args.animbank)
    cam = synth_camera()
    config = TrackerConfig(
        point_budget=2048, solver=args.solver, use_pallas=use_pallas,
        cnn_every_frame=not args.dynamics_only)
    params = physics_params(config)
    cnn_params = None
    if not args.dynamics_only:
        cnn_params = load_cnnb(args.cnnb or DEFAULT_CNNB)

    if args.tracks < 1 or args.frames < 1:
        ap.error("--tracks and --frames must be >= 1")
    T = args.tracks
    starts = (np.arange(T) * 131) % max(1, len(bank) - args.frames * args.stride)
    states = batched_tracker_state(model, T)
    if not args.cold_start:
        states = states._replace(body=states.body._replace(
            pose=jnp.asarray(bank[starts])))

    render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
    step = jax.jit(lambda s, d: batched_update(s, model, cnn_params, d, cam,
                                               config, params))
    errs = []
    t0 = time.time()
    for f in range(args.frames):
        ids = starts + f * args.stride
        gt = jnp.asarray(bank[ids])
        depths = render(gt)
        states, poses_user = step(states, depths)
        je = jnp.linalg.norm(states.body.pose[:, :, :3] - gt[:, :, :3],
                             axis=-1).mean()
        errs.append(float(je))
        if f % 8 == 0 or f == args.frames - 1:
            print(f"frame {f:4d}: mean joint err {float(je)*1000:7.2f} mm")
        if args.dump_png and f % 8 == 0:
            from ..utils.viz import depth_to_rgb, draw_points, write_png
            img = depth_to_rgb(np.asarray(depths[0]))
            # tracked bone origins (green) vs ground truth (red), projected
            pb = np.asarray(states.body.pose[0, :, :3])
            gb = np.asarray(gt[0, :, :3])
            from ..maths.pose import pose_apply, pose_inverse
            inv = pose_inverse(cam.pose)
            for pts, col in ((gb, (255, 64, 64)), (pb, (64, 255, 96))):
                local = np.array(jax.vmap(
                    lambda p: pose_apply(inv, jnp.asarray(p)))(pts))
                local[:, 2] = np.maximum(local[:, 2], 1e-6)
                px = np.asarray(cam.projectz(jnp.asarray(local)))
                img = draw_points(img, px,
                                  colors=np.tile(col, (len(px), 1)), size=2)
            write_png(os.path.join(args.dump_png, f"depth_{f:04d}.png"), img)
            try:
                from ..assets_paths import DEFAULT_VANITY_BONES
                from ..model.hand import get_pose_user
                from ..model.meshes import export_obj, load_display_meshes
                meshes = load_display_meshes(DEFAULT_VANITY_BONES)
                export_obj(os.path.join(args.dump_png, f"hand_{f:04d}.obj"),
                           meshes, np.asarray(get_pose_user(
                               jtu.tree_map(lambda x: x[0], states.body),
                               model)))
            except Exception as e:  # vanity_bones.json optional
                print(f"(obj export skipped: {e})", file=sys.stderr)
    if args.dump_png:
        from ..utils.report import write_html_report
        print("report:", write_html_report(args.dump_png))
    dt = time.time() - t0
    total = args.frames * T
    print(f"\ntracked {total} frames in {dt:.2f}s "
          f"({total/dt:.0f} fps incl. synthesis+compile)")
    print(f"mean joint error: {np.mean(errs)*1000:.2f} mm "
          f"(final {errs[-1]*1000:.2f} mm)")
    return np.mean(errs)


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
