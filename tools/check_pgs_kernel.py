#!/usr/bin/env python
"""CPU equivalence check: solver=kernel (interpret) vs sequential/colored."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["HTS_KERNEL_INTERPRET"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

jax.config.update("jax_platforms", "cpu")

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                    DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.parallel.tracks import (batched_tracker_state,
                                                       batched_update)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params

T = 3
ITERS = int(os.environ.get("CHECK_ITERS", "3"))
IPOST = int(os.environ.get("CHECK_IPOST", "2"))


def main():
    model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    poses = jnp.asarray(bank[[10, 210, 500]])
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
    depths = render(poses)
    depths.block_until_ready()
    print("depth ok", flush=True)

    base = TrackerConfig(point_budget=256, cnn_every_frame=False,
                         cloud_rows_per_body=32,
                         physics_iterations=ITERS,
                         physics_iterations_post=IPOST,
                         use_pallas=False)

    outs = {}
    for solver in ("sequential", "colored", "kernel"):
        config = dataclasses.replace(base, solver=solver)
        params = physics_params(config)
        states = batched_tracker_state(model, T)
        states = states._replace(body=states.body._replace(pose=poses))
        st, pose_user = jax.jit(
            lambda s, d: batched_update(s, model, None, d, cam, config,
                                        params))(states, depths)
        jax.block_until_ready(pose_user)
        outs[solver] = np.asarray(st.body.pose)
        print(f"{solver} done", flush=True)

    for a, b in (("sequential", "colored"), ("sequential", "kernel"),
                 ("colored", "kernel")):
        d = np.abs(outs[a] - outs[b])
        print(f"{a:10s} vs {b:10s}: max|dpose| = {d.max():.3e} "
              f"pos {d[..., :3].max():.3e}")
    assert np.abs(outs["colored"] - outs["kernel"]).max() < 2e-4, "MISMATCH"
    print("OK")


if __name__ == "__main__":
    main()
