#!/usr/bin/env python
"""accum_error_threshold sweep on the recorded CNN-cadence fixtures
(VERDICT r3 item 7 / ROADMAP: quantify acceptance-gating pose snapping).

The accept gate (handtrack.h:714-726): the background-thread pose is taken
when the accumulated FitError improvement exceeds accum_error_threshold;
taking after several withheld frames SNAPS the pose.  This sweep tracks the
committed 128-frame real-speed recording (cnntrack_rec2, spanning a fast
segment with repeated re-acquisitions) at k=4 for a threshold grid and
reports per-threshold: mean/final joint error vs ground truth, take count,
and the snap metric (p95 / max inter-frame joint movement on take frames).

CPU-friendly (T=1, colored solver):  python tools/eval_accum_threshold.py
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
if jax.default_backend() != "cpu" and os.environ.get("HTS_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import jax.tree_util as jtu

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_CNNB,
                                                    DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.cnn.model import load_cnnb
from hand_tracking_samples_tpu.data.dataset import load_dataset
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.parallel.tracks import (batched_tracker_state,
                                                       batched_update)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")
K = int(os.environ.get("EVAL_K", "4"))
REC = os.environ.get("EVAL_REC", "cnntrack_rec2")
THRESHOLDS = [0.0, 0.005, 0.02, 0.05, 0.1]


def run_one(hand_model, ds, cam, cnn, thresh):
    config = TrackerConfig(cnn_every_frame=True, cnn_every_k=K,
                           solver="colored", accum_error_threshold=thresh)
    params = physics_params(config)
    states = batched_tracker_state(hand_model, 1)
    depths = jnp.asarray(ds.depth)[:, None]
    step_cnn = jax.jit(lambda s, d: batched_update(
        s, hand_model, cnn, d, cam, config, params, run_cnn=True)[0])
    step_dyn = jax.jit(lambda s, d: batched_update(
        s, hand_model, cnn, d, cam, config, params, run_cnn=False)[0])
    F = len(ds.pose)
    jes, jumps, takes = [], [], 0
    prev_pose = None
    for f in range(F):
        heavy = f % K == 0
        states = (step_cnn if heavy else step_dyn)(states, depths[f])
        mine = np.asarray(states.body.pose[0])
        je = np.linalg.norm(mine[:, :3] - ds.pose[f][:, :3], axis=1).mean()
        jes.append(je)
        if prev_pose is not None:
            jump = np.linalg.norm(mine[:, :3] - prev_pose[:, :3],
                                  axis=1).mean()
            if heavy:
                jumps.append(jump)
        prev_pose = mine
    jumps = np.asarray(jumps)
    return {
        "threshold": thresh,
        "mean_je_mm": round(float(np.mean(jes) * 1000), 2),
        "final_je_mm": round(float(jes[-1] * 1000), 2),
        "p95_heavy_jump_mm": round(float(np.percentile(jumps, 95) * 1000), 2),
        "max_heavy_jump_mm": round(float(jumps.max() * 1000), 2),
    }


def main():
    model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
    ds = load_dataset(os.path.join(FIXTURES, REC))
    cam = ds.info.camera()
    cnn = load_cnnb(DEFAULT_CNNB)
    out = []
    for t in THRESHOLDS:
        r = run_one(model, ds, cam, cnn, t)
        out.append(r)
        print(json.dumps(r), flush=True)
    path = os.path.join(os.path.dirname(FIXTURES), "..", "eval",
                        f"accum_threshold_{os.environ.get('ROUND', 'r04')}"
                        f".json")
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    json.dump({"rec": REC, "k": K, "grid": out,
               "command": "python tools/eval_accum_threshold.py"},
              open(path, "w"), indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
