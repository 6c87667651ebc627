#!/usr/bin/env python
"""Decompose the dynamics frame-step cost by timing config variants.

Each variant disables one stage (or scales iteration counts) so stage cost
falls out by subtraction / extrapolation — jit-boundary splitting lies (see
docs/PERFORMANCE.md), so never time sub-stages directly.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
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

N_TRACKS = int(os.environ.get("BENCH_TRACKS", "512"))
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "4"))


def make_depths(model, cam, bank):
    starts = (np.arange(N_TRACKS) * 37) % (len(bank) - N_FRAMES)
    frame_ids = (starts[None, :] + np.arange(N_FRAMES)[:, None])
    poses = jnp.asarray(bank[frame_ids])
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
    RCHUNK = 256
    depths = jnp.stack([
        jnp.concatenate([render(poses[f, i:i + RCHUNK])
                         for i in range(0, N_TRACKS, RCHUNK)])
        for f in range(N_FRAMES)])
    depths.block_until_ready()
    return depths, poses


def time_config(model, cam, depths, poses, config, label):
    params = physics_params(config)
    states = batched_tracker_state(model, N_TRACKS)
    states = states._replace(body=states.body._replace(pose=poses[0]))
    run = jax.jit(lambda s, d: track_sequences(s, model, None, d, cam,
                                               config, params))
    t0 = time.time()
    out = run(states, depths)
    jax.block_until_ready(out)
    warm = time.time() - t0
    t0 = time.time()
    out = run(states, depths)
    jax.block_until_ready(out)
    dt = time.time() - t0
    ms = dt / N_FRAMES * 1000.0
    print(f"{label:42s} {ms:8.1f} ms/frame  (warmup {warm:.0f}s)", flush=True)
    return ms


def main():
    model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    depths, poses = make_depths(model, cam, bank)

    base = TrackerConfig(point_budget=int(os.environ.get("PROF_BUDGET", "2048")), cnn_every_frame=False,
                         solver="kernel", cloud_rows_per_body=128,
                         use_pallas=True, contacts_mode="exact")

    r = {}
    r["base"] = time_config(model, cam, depths, poses, base, "base (16+4 iters)")
    r["it11"] = time_config(model, cam, depths, poses,
                            dataclasses.replace(base, physics_iterations=1,
                                                physics_iterations_post=1),
                            "iters 1+1 (sweep cost via slope)")
    r["nocontact"] = time_config(model, cam, depths, poses,
                                 dataclasses.replace(base, physics_use_collision=0),
                                 "no contacts")
    r["nochamber"] = time_config(model, cam, depths, poses,
                                 dataclasses.replace(base, boundary_planes=0),
                                 "no boundary planes")
    r["nopallas"] = time_config(model, cam, depths, poses,
                                dataclasses.replace(base, use_pallas=False),
                                "XLA correspondence")
    r["pb512"] = time_config(model, cam, depths, poses,
                             dataclasses.replace(base, point_budget=512),
                             "point budget 512")

    sweep_ms = (r["base"] - r["it11"]) / 18.0  # 20 sweeps vs 2
    print(f"\nper-sweep cost      : {sweep_ms:6.2f} ms -> 20 sweeps = {20*sweep_ms:.1f} ms")
    print(f"non-sweep (assembly+corr+cloud): {r['it11'] - 2*sweep_ms:6.1f} ms")
    print(f"contacts total       : {r['base'] - r['nocontact']:6.1f} ms")
    print(f"chamber total        : {r['base'] - r['nochamber']:6.1f} ms")


if __name__ == "__main__":
    main()
