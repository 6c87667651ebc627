#!/usr/bin/env python
"""Time individual frame-step stages in isolation with real shapes (T=512).

Isolation changes fusion, so treat these as magnitude estimates; the
subtraction-based numbers in profile_frame.py are the ground truth.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                    DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params
from hand_tracking_samples_tpu.physics.solver import BodyState

T = int(os.environ.get("BENCH_TRACKS", "512"))
N = 1024


def bench(fn, *args, label=""):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / 3 * 1000
    print(f"{label:46s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    config = TrackerConfig(point_budget=N, cnn_every_frame=False,
                           solver="colored", use_pallas=True)
    params = physics_params(config)

    rng = np.random.RandomState(0)
    poses = jnp.asarray(bank[(rng.randint(0, len(bank), T))])  # (T,17,7)
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
    depths = jnp.concatenate([render(poses[i:i+256]) for i in range(0, T, 256)])
    depths.block_until_ready()
    states = BodyState(pose=poses,
                       linear_momentum=jnp.zeros((T, 17, 3)),
                       angular_momentum=jnp.zeros((T, 17, 3)))

    from hand_tracking_samples_tpu.imaging.image_ops import (compact_points,
                                                             point_cloud)

    def stage_cloud(depths):
        def one(depth):
            pts_all, mask_all = point_cloud(depth, cam, 0.1, config.drangey)
            sub = mask_all & ((jnp.cumsum(mask_all) - 1) % 4 == 0)
            return compact_points(pts_all, sub, N)
        return jax.vmap(one)(depths)

    pts, mask = jax.jit(stage_cloud)(depths)
    jax.block_until_ready((pts, mask))
    bench(stage_cloud, depths, label="point_cloud + subsample + compact")

    from hand_tracking_samples_tpu.fitting.cloud import (cloud_constraint_rows,
                                                         cloud_chamber_rows)

    def stage_rows(states, pts, mask):
        def one(s, p, m):
            return cloud_constraint_rows(s, model, p, m,
                                         origin=jnp.zeros(3), use_kernel=True)
        return jax.vmap(one)(states, pts, mask)

    rows = jax.jit(stage_rows)(states, pts, mask)
    jax.block_until_ready(rows)
    bench(stage_rows, states, pts, mask, label="cloud_constraint_rows (pallas corr)")

    def stage_rows_xla(states, pts, mask):
        def one(s, p, m):
            return cloud_constraint_rows(s, model, p, m,
                                         origin=jnp.zeros(3), use_kernel=False)
        return jax.vmap(one)(states, pts, mask)
    bench(stage_rows_xla, states, pts, mask, label="cloud_constraint_rows (XLA corr)")

    from hand_tracking_samples_tpu.physics.colored import pack_single_body_linear

    def stage_pack(rows):
        return jax.vmap(lambda r: pack_single_body_linear(r, 17, 128))(rows)
    bench(stage_pack, rows, label="pack_single_body_linear (128 slots)")

    from hand_tracking_samples_tpu.physics.contacts import contact_rows

    def stage_contacts(states):
        return jax.vmap(lambda s: contact_rows(s, model, params))(states)
    bench(stage_contacts, states, label="contact_rows (87 pairs SAT)")

    from hand_tracking_samples_tpu.model.hand import (joint_angular_rows,
                                                      joint_linear_rows)

    def stage_joints(states):
        jl = jax.vmap(lambda s: joint_linear_rows(s, model))(states)
        ja = jax.vmap(lambda s: joint_angular_rows(s, model, params))(states)
        return jl, ja
    bench(stage_joints, states, label="joint row factories")

    def stage_chamber(states, pts, mask):
        from hand_tracking_samples_tpu.tracker.runtime import BOUNDARY_OUTDIRS
        def one(s, p, m):
            return cloud_chamber_rows(s, model, p, m, BOUNDARY_OUTDIRS,
                                      jnp.zeros(3), jnp.asarray([0.0, 0, 1]),
                                      10.0)
        return jax.vmap(one)(states, pts, mask)
    bench(stage_chamber, states, pts, mask, label="cloud_chamber_rows")

    # enhancements
    from hand_tracking_samples_tpu.tracker.runtime import hand_model_enhancements
    def stage_enh(states):
        return jax.vmap(lambda s: hand_model_enhancements(s, model, params))(states)
    bench(stage_enh, states, label="hand_model_enhancements")

    # full colored solve with prebuilt rows (prep + sweeps)
    from hand_tracking_samples_tpu.physics.schedule import (build_hand_schedule,
                                                            pair_linear,
                                                            pair_angular)
    from hand_tracking_samples_tpu.physics.colored import physics_update_colored
    from hand_tracking_samples_tpu.model.hand import body_params
    sched = build_hand_schedule(model, "exact")
    bp = body_params(model)

    def stage_solve(states, rows):
        def one(s, r):
            blk = pack_single_body_linear(r, 17, 128)
            from hand_tracking_samples_tpu.model.hand import (
                joint_angular_rows, joint_linear_rows)
            nailed = pair_linear(joint_linear_rows(s, model), sched.joint_lin)
            cont = pair_linear(contact_rows(s, model, params), sched.contact)
            ja = pair_angular(joint_angular_rows(s, model, params),
                              sched.joint_ang)
            return physics_update_colored(s, bp, [blk, nailed, cont], [ja],
                                          params)
        return jax.vmap(one)(states, rows)
    bench(stage_solve, states, rows, label="pack+joint/contact rows+colored solve")

    def stage_solve_11(states, rows):
        def one(s, r):
            blk = pack_single_body_linear(r, 17, 128)
            nailed = pair_linear(joint_linear_rows(s, model), sched.joint_lin)
            cont = pair_linear(contact_rows(s, model, params), sched.contact)
            ja = pair_angular(joint_angular_rows(s, model, params),
                              sched.joint_ang)
            return physics_update_colored(s, bp, [blk, nailed, cont], [ja],
                                          params, iterations=1,
                                          iterations_post=1)
        return jax.vmap(one)(states, rows)
    bench(stage_solve_11, states, rows, label="  same but 1+1 iters (prep cost)")


if __name__ == "__main__":
    main()
