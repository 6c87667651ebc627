#!/usr/bin/env python
"""Measure the repo tracker's fast-segment drift on the reference protocol.

Runs the exact fastdrift golden protocol (tests/fixtures/fastdrift_ref.json,
tools/golden_gen.cpp GG_FASTDRIFT): 64 tracks starting at (t*37) % (len-32)
from the ground-truth pose, 32 dynamics-only frames each, and reports our
per-frame mean joint error next to the C++ reference's.

Usage (real TPU by default; HTS_PLATFORM=cpu for a slow CPU run):
    python tools/eval_fastdrift.py [--solver kernel] [--cap 128] [--budget 1024]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                     DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.parallel.tracks import (batched_tracker_state,
                                                       track_sequences)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="kernel")
    ap.add_argument("--cap", type=int, default=128)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--pallas", type=int, default=1)
    ap.add_argument("--tracks", type=int, default=64)
    ap.add_argument("--json", default="", help="write a summary artifact")
    ap.add_argument("--attribution", action="store_true",
                    help="also run the median-gap attribution matrix "
                    "(colored cap512, kernel budget4096, colored cap512 "
                    "budget4096) and embed the results")
    args = ap.parse_args()

    model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    ref = json.load(open(os.path.join(os.path.dirname(__file__), "..",
                                      "tests", "fixtures",
                                      "fastdrift_ref.json")))
    T, F = args.tracks, ref["n_frames"]

    starts = (np.arange(T) * 37) % (len(bank) - F)
    frame_ids = starts[None, :] + np.arange(F)[:, None]
    poses = jnp.asarray(bank[frame_ids])                       # (F, T, 17, 7)
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
    depths = jnp.stack([render(poses[f]) for f in range(F)])
    depths.block_until_ready()

    from hand_tracking_samples_tpu.parallel.tracks import batched_update

    def measure(solver, cap, budget, pallas):
        config = TrackerConfig(point_budget=budget, cnn_every_frame=False,
                               solver=solver, cloud_rows_per_body=cap,
                               use_pallas=bool(pallas))
        params = physics_params(config)
        states = batched_tracker_state(model, T)
        states = states._replace(body=states.body._replace(pose=poses[0]))

        # collect internal COM-frame body poses per frame (the C++ golden
        # measures rigidbodies[b].position, not GetPoseUser rig-space poses)
        def step(s, d):
            s, _ = batched_update(s, model, None, d, cam, config, params)
            return s, s.body.pose

        run = jax.jit(lambda s, ds: jax.lax.scan(step, s, ds))
        t0 = time.time()
        _, out_poses = run(states, depths)                     # (F, T, 17, 7)
        out_poses.block_until_ready()
        print(f"# run {time.time()-t0:.1f}s  solver={solver} cap={cap} "
              f"budget={budget} pallas={pallas} tracks={T}", flush=True)
        return np.asarray(out_poses)

    config = TrackerConfig(point_budget=args.budget, cnn_every_frame=False,
                           solver=args.solver, cloud_rows_per_body=args.cap,
                           use_pallas=bool(args.pallas))
    op = measure(args.solver, args.cap, args.budget, args.pallas)
    gt = np.asarray(poses)
    err = np.linalg.norm(op[..., :3] - gt[..., :3], axis=-1).mean(-1)  # (F,T)
    rm = np.array(ref["mean_err_per_frame"])
    print(f"{'frame':>5} {'ours_mm':>8} {'ref_mm':>8}")
    for f in range(F):
        print(f"{f:5d} {err[f].mean()*1000:8.2f} {rm[f]*1000:8.2f}")
    print(f"final mean: ours {err[-1].mean()*1000:.2f}mm  "
          f"ref {rm[-1]*1000:.2f}mm  ratio {err[-1].mean()/rm[-1]:.3f}")
    rf = np.array(ref["final_err_per_track"])[:T]
    mine = err[-1]
    if T <= 16:
        for t in range(T):
            print(f"track {t} start={starts[t]}: ours "
                  f"{mine[t]*1000:7.1f}mm ref {rf[t]*1000:7.1f}mm")
    print(f"per-track final: median ours {np.median(mine)*1000:.2f} "
          f"ref {np.median(rf)*1000:.2f}; "
          f"diverged(>40mm) ours {(mine>0.04).sum()} ref {(rf>0.04).sum()}")
    if args.json:
        import jax as _jax
        payload = {
            "round": os.environ.get("EVAL_ROUND", ""),
            "protocol": f"{T} tracks x {F} frames dynamics-only, "
                        f"solver={args.solver} cap={args.cap} "
                        f"budget={args.budget} (GG_FASTDRIFT protocol)",
            "backend": _jax.devices()[0].platform,
            "final_mean_mm": round(float(err[-1].mean() * 1000), 2),
            "ref_final_mean_mm": round(float(rm[-1] * 1000), 2),
            "ratio": round(float(err[-1].mean() / rm[-1]), 3),
            "final_median_mm": round(float(np.median(mine) * 1000), 2),
            "ref_final_median_mm": round(float(np.median(rf) * 1000), 2),
            "diverged_gt40mm": int((mine > 0.04).sum()),
            "ref_diverged_gt40mm": int((rf > 0.04).sum()),
            "mean_err_per_frame_mm": [round(float(e * 1000), 2)
                                      for e in err.mean(-1)],
            "command": " ".join(["python"] + sys.argv),
        }
        if args.attribution:
            # median-gap attribution (VERDICT r4 item 3): budget vs cap.
            # budget 4096 at T=512 full-pipeline exceeds the chip's HBM, so
            # 2048 stays the shipped default; these entries document the
            # accuracy-first configs and what each lever buys.
            rows = []
            for (so, cp, bu, pa, note) in [
                    ("colored", 512, args.budget, 0,
                     "cap lifted (~uncapped), shipped budget"),
                    ("kernel", 128, 4096, 1,
                     "budget doubled, shipped cap"),
                    ("colored", 512, 4096, 0,
                     "both lifted (accuracy-first config)")]:
                om = measure(so, cp, bu, pa)
                em = np.linalg.norm(om[..., :3] - gt[..., :3],
                                    axis=-1).mean(-1)[-1]
                rows.append({
                    "solver": so, "cap": cp, "budget": bu,
                    "final_mean_mm": round(float(em.mean() * 1000), 2),
                    "final_median_mm": round(float(np.median(em) * 1000), 2),
                    "median_ratio": round(
                        float(np.median(em) / np.median(rf)), 3),
                    "diverged_gt40mm": int((em > 0.04).sum()),
                    "note": note})
                print(f"#   -> median {rows[-1]['final_median_mm']} mm "
                      f"(ratio {rows[-1]['median_ratio']})", flush=True)
            payload["attribution"] = rows
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
