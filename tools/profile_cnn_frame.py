#!/usr/bin/env python
"""Time the CNN-frame (update_cnn_model) stages in isolation at T=512.

Isolation changes fusion (see profile_frame.py); magnitudes only.
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
                                                    DEFAULT_CNNB,
                                                    DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import (TrackerState,
                                                       physics_params)
from hand_tracking_samples_tpu.physics.solver import BodyState

T = int(os.environ.get("BENCH_TRACKS", "512"))


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
    config = TrackerConfig(point_budget=1024, cnn_every_frame=True,
                           solver="kernel", use_pallas=True)
    params = physics_params(config)
    from hand_tracking_samples_tpu.cnn.model import load_cnnb
    cnn_params = load_cnnb(DEFAULT_CNNB)

    rng = np.random.RandomState(0)
    poses = jnp.asarray(bank[(rng.randint(0, len(bank), T))])
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
    depths = jnp.concatenate([render(poses[i:i+256]) for i in range(0, T, 256)])
    depths.block_until_ready()
    states = TrackerState(
        body=BodyState(pose=poses,
                       linear_momentum=jnp.zeros((T, 17, 3)),
                       angular_momentum=jnp.zeros((T, 17, 3))),
        prev_frame_error=jnp.zeros(T), initializing=jnp.zeros(T, jnp.int32))

    drange = (0.1, config.drangey)

    from hand_tracking_samples_tpu.segment.handsegment import (
        cnn_input_from_segment, hand_segment_vr)

    def stage_seg(depths):
        return jax.vmap(lambda d: hand_segment_vr(
            d, cam, 0xF, drange, config.segment_scale))(depths)
    seg = jax.jit(stage_seg)(depths)
    jax.block_until_ready(seg)
    bench(stage_seg, depths, label="hand_segment_vr")

    def stage_cnn(seg):
        from hand_tracking_samples_tpu.cnn.model import forward
        x = jax.vmap(lambda d: cnn_input_from_segment(
            d, cam.depth_scale, drange))(seg.depth)
        return forward(cnn_params, x)
    out = jax.jit(stage_cnn)(seg)
    bench(stage_cnn, seg, label="cnn_input + forward")

    from hand_tracking_samples_tpu.cnn.labels import analyze_cnn_output

    def stage_analyze(out, seg):
        return jax.vmap(lambda o, p: analyze_cnn_output(
            o, cam.sub(4)._replace(pose=p)))(out, seg.cam.pose)
    bench(stage_analyze, out, seg, label="analyze_cnn_output")

    from hand_tracking_samples_tpu.imaging.image_ops import cloud_from_depth

    def stage_cloud(depths):
        return jax.vmap(lambda d: cloud_from_depth(
            d, cam, drange[0], drange[1], config.subsample_fraction,
            config.point_budget))(depths)
    pts, mask = jax.jit(stage_cloud)(depths)
    jax.block_until_ready((pts, mask))
    bench(stage_cloud, depths, label="cloud_from_depth")

    from hand_tracking_samples_tpu.fitting.cloud import fit_error

    def stage_fiterror(states, pts, mask, depths):
        return jax.vmap(lambda s, p, m, d: fit_error(
            s, model, p, m, d, cam, config.bone_sum_error_scale,
            use_kernel=True))(states.body, pts, mask, depths)
    bench(stage_fiterror, states, pts, mask, depths, label="fit_error (x1)")

    analysis = jax.jit(stage_analyze)(out, seg)
    from hand_tracking_samples_tpu.tracker.runtime import multi_step_sim

    def stage_multistep(states, analysis, pts, mask, seg):
        return jax.vmap(lambda b, a, p, m, c: multi_step_sim(
            b, model, a, p, m, c, config, params))(
            states.body, analysis, pts, mask, seg.cam.pose)
    bench(stage_multistep, states, analysis, pts, mask, seg,
          label=f"multi_step_sim ({config.steps} steps)")

    from hand_tracking_samples_tpu.tracker.runtime import update_cnn_model

    def stage_ucm(states, depths):
        return jax.vmap(lambda s, d: update_cnn_model(
            s, model, cnn_params, d, cam, config, params))(states, depths)
    bench(stage_ucm, states, depths, label="update_cnn_model (whole)")

    from hand_tracking_samples_tpu.tracker.runtime import update

    def stage_update(states, depths):
        return jax.vmap(lambda s, d: update(
            s, model, cnn_params, d, cam, config, params))(states, depths)
    bench(stage_update, states, depths, label="update run_cnn=True (whole)")


if __name__ == "__main__":
    main()
