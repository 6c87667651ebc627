#!/usr/bin/env python
"""Device-level op attribution via jax.profiler (works through the axon
tunnel: TPU op events with real durations land in the trace).

Usage: PROF_TRACKS=512 python tools/prof_trace.py [update_full|update_dyn|msim]
Prints the top device ops by total time for ONE execution of an F-frame
scan, aggregated by op name.
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                    DEFAULT_CNNB,
                                                    DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.cnn.model import load_cnnb
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.parallel.tracks import batched_tracker_state
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params

T = int(os.environ.get("PROF_TRACKS", "512"))
F = int(os.environ.get("PROF_FRAMES", "4"))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "update_full"
    model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    cnn_params = load_cnnb(DEFAULT_CNNB)
    config = TrackerConfig(cnn_every_frame=True, solver="kernel",
                           use_pallas=True)
    params = physics_params(config)
    starts = (np.arange(T) * 37) % (len(bank) - F)
    fids = (starts[None, :] + np.arange(F)[:, None])
    poses = jnp.asarray(bank[fids])
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
    depths = jnp.stack([
        jnp.concatenate([render(poses[f, i:i + 256]) for i in range(0, T, 256)])
        for f in range(F)])
    depths.block_until_ready()
    states = batched_tracker_state(model, T)
    states = states._replace(body=states.body._replace(pose=poses[0]))

    from hand_tracking_samples_tpu.tracker import runtime as rt

    def mk(run_cnn):
        def fr(states, depth):
            def one(s, d):
                s2, _, _ = rt.update(s, model, cnn_params, d, cam, config,
                                     params, run_cnn=run_cnn)
                return s2
            return jax.vmap(one)(states, depth)

        def run(states, depths):
            def step(c, d):
                return fr(c, d), 0
            c, _ = jax.lax.scan(step, states, depths)
            return c
        return jax.jit(run)

    if which == "msim":
        def ms(states, depth):
            def one(s, d):
                _, a, _, _, vp, vm = rt._cnn_frame_inputs(
                    cnn_params, d, cam, config)
                vph = vp if rt._planes_path(config) else None
                cpose = jnp.concatenate([jnp.zeros(3),
                                         jnp.asarray([0.0, 0, 0, 1])])
                b = rt.multi_step_sim(s.body, model, a, vp, vm, cpose,
                                      config, params, points_ph=vph)
                return s._replace(body=b)
            return jax.vmap(one)(states, depth)

        def run(states, depths):
            def step(c, d):
                return ms(c, d), 0
            c, _ = jax.lax.scan(step, states, depths)
            return c
        f = jax.jit(run)
    else:
        f = mk(which == "update_full")

    out = jax.block_until_ready(f(states, depths))
    tdir = f"/tmp/jaxtrace_{which}"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        out = jax.block_until_ready(f(states, depths))

    path = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(path))
    evs = d.get("traceEvents", [])
    # device events live under the TPU pid; keep complete events only
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in evs if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pid_names.items() if "TPU" in n}
    agg = {}
    total = 0.0
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3        # us -> ms
            agg.setdefault(name, [0.0, 0])
            agg[name][0] += dur
            agg[name][1] += 1
            total += dur
    print(f"== {which}: device total {total:.1f} ms over {F} frames "
          f"({total / F:.2f} ms/frame, T={T}) ==")
    for n, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{ms:9.2f} ms  {ms / F:8.3f}/frame  x{cnt:4d}  {n[:90]}")

    # ---- source-line attribution (PROF_BY_SOURCE=1): every device op's
    # args carry a `source_stack`; aggregating by the topmost repo frame
    # attributes the ENTIRE frame including the long tail of small fusions
    # the name-ranked view hides.  This view found the round-5 wins
    # (the body_sc relayout chain, the planes_t transposes).
    if os.environ.get("PROF_BY_SOURCE", "1") == "1":
        by_src = {}
        for e in evs:
            if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
                continue
            name = e.get("name", "")
            if name.startswith("jit_") or name.startswith("while.") \
                    and e.get("dur", 0) > 1e5:
                continue                       # container events
            args = e.get("args", {})
            src = "?"
            for ln in args.get("source_stack", "").split("\n"):
                if "/hand_tracking_samples_tpu/" in ln:
                    src = ln.strip()
                    break
            if src == "?":
                src = args.get("source", name)
            by_src[src] = by_src.get(src, 0.0) + e.get("dur", 0) / 1e3
        print("\n-- by source line (ms/frame) --")
        for src, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{ms / F:8.3f}  {src}")


if __name__ == "__main__":
    main()
