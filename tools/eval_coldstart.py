#!/usr/bin/env python
"""Cold-start accuracy eval: full CNN-guided pipeline from the model's rest
pose over synthetic frames; reports mean joint error vs ground truth.

VERDICT r1 item 4 target: <8 mm mean over 64 synthetic frames."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                    DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.cnn.model import load_cnnb
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.parallel.tracks import (batched_tracker_state,
                                                       batched_update)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params

from hand_tracking_samples_tpu.assets_paths import DEFAULT_CNNB  # noqa: E402

CNNB = os.environ.get("EVAL_CNNB", DEFAULT_CNNB)
T = int(os.environ.get("EVAL_TRACKS", "64"))
F = int(os.environ.get("EVAL_FRAMES", "8"))
SOLVER = os.environ.get("EVAL_SOLVER", "kernel")
HYP = int(os.environ.get("EVAL_HYP", "1"))  # kickstart_multi hypotheses


def main():
    model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    config = TrackerConfig(point_budget=int(os.environ.get(
                               "EVAL_POINT_BUDGET", "2048")),
                           cnn_every_frame=True,
                           solver=SOLVER, use_pallas=SOLVER == "kernel",
                           accum_error_threshold=float(
                               os.environ.get("EVAL_ACCUM", "0.0")),
                           cloud_rows_per_body=int(
                               os.environ.get("EVAL_CLOUD_ROWS", "128")))
    params = physics_params(config)
    cnn_params = load_cnnb(CNNB)

    # T independent cold starts spread over the bank; each tracks F frames
    starts = (np.arange(T) * 211) % (len(bank) - F)
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))

    states = batched_tracker_state(model, T)   # rest pose, NOT ground truth
    states = states._replace(initializing=jnp.full(T, 50, jnp.int32))
    run = jax.jit(lambda s, d: batched_update(s, model, cnn_params, d, cam,
                                              config, params))
    ks_frames = int(os.environ.get("EVAL_HYP_FRAMES", "1"))
    if HYP > 1:
        from hand_tracking_samples_tpu.tracker.runtime import kickstart_multi
        lam = float(os.environ.get("EVAL_HYP_LM", "0.1"))
        ks = jax.jit(jax.vmap(lambda s, d: kickstart_multi(
            s, model, cnn_params, d, cam, config, params, n_hyp=HYP,
            lm_weight=lam)[0]))
        for f in range(ks_frames):
            states = ks(states, render(jnp.asarray(bank[starts + f])))
        print(f"kickstart_multi n_hyp={HYP} applied at frames "
              f"0..{ks_frames - 1}", flush=True)
    errs = []
    for f in range(F):
        gt = jnp.asarray(bank[starts + f])
        depths = render(gt)
        states, _ = run(states, depths)
        e = jnp.linalg.norm(states.body.pose[:, :, :3] - gt[:, :, :3],
                            axis=-1).mean(axis=-1)
        errs.append(np.asarray(e))
        print(f"frame {f}: mean {np.mean(errs[-1])*1000:6.2f} mm   "
              f"median {np.median(errs[-1])*1000:6.2f} mm   "
              f"<8mm: {(errs[-1] < 0.008).mean()*100:4.0f}%", flush=True)
    final = np.mean(errs[-1])
    print(f"\ncold-start after {F} frames over {T} starts: "
          f"mean {final*1000:.2f} mm ({CNNB})")
    out = os.environ.get("EVAL_DUMP", "")
    if out:
        np.savez(out, errs=np.stack(errs), starts=starts)
        print("dumped", out)


if __name__ == "__main__":
    main()
