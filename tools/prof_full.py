#!/usr/bin/env python
"""Stage-cost attribution for the full CNN-guided pipeline (BASELINE cfg 3).

Times each heavy-frame stage at T tracks on the real chip, amortizing the
axon tunnel's fixed dispatch cost by scanning each stage over F frames of
DIFFERENT data (identical inputs would be CSE'd/constant-folded).

Usage: PROF_TRACKS=512 python tools/prof_full.py [stage ...]
Stages: update_full update_dyn prologue segment cnn analyze fiterr msim
        contacts cloudrows solve
"""
import os
import sys
import time

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
F = int(os.environ.get("PROF_FRAMES", "8"))
REPS = int(os.environ.get("PROF_REPS", "3"))


def main():
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
    from hand_tracking_samples_tpu.imaging.image_ops import cloud_from_depth

    def clouds_of(depth):
        return cloud_from_depth(depth, cam, 0.1, config.drangey,
                                config.subsample_fraction, config.point_budget)

    def scan_stage(per_frame):
        """per_frame(carry, depth_t) -> carry; scans over F frames."""
        def run(states, depths):
            def step(c, d):
                return per_frame(c, d), 0
            c, _ = jax.lax.scan(step, states, depths)
            return c
        return jax.jit(run)

    def timeit(name, fn, *args):
        out = jax.block_until_ready(fn(*args))
        dts = []
        for _ in range(REPS):
            t0 = time.time()
            out = jax.block_until_ready(fn(*args))
            dts.append(time.time() - t0)
        ms = min(dts) / F * 1000.0
        print(f"{name:14s} {ms:8.2f} ms/frame   ({T} tracks, best of {REPS})",
              flush=True)
        return out

    want = set(sys.argv[1:]) or None

    def on(name):
        return want is None or name in want

    if on("update_full"):
        def hf(states, depth):
            def one(s, d):
                s2, _, _ = rt.update(s, model, cnn_params, d, cam, config,
                                     params, run_cnn=True)
                return s2
            return jax.vmap(one)(states, depth)
        timeit("update_full", scan_stage(hf), states, depths)

    if on("update_dyn"):
        def lf(states, depth):
            def one(s, d):
                s2, _, _ = rt.update(s, model, cnn_params, d, cam, config,
                                     params, run_cnn=False)
                return s2
            return jax.vmap(one)(states, depth)
        timeit("update_dyn", scan_stage(lf), states, depths)

    if on("prologue"):
        def pro(states, depth):
            def one(s, d):
                seg, analysis, ci, co, vp, vm = rt._cnn_frame_inputs(
                    cnn_params, d, cam, config)
                return s._replace(prev_frame_error=s.prev_frame_error
                                  + co.sum() + vp.sum() + seg.cam.pose.sum()
                                  + analysis.palmq.sum())
            return jax.vmap(one)(states, depth)
        timeit("prologue", scan_stage(pro), states, depths)

    if on("segment"):
        from hand_tracking_samples_tpu.segment.handsegment import (
            cnn_input_from_segment, hand_segment_vr)

        def seg_only(states, depth):
            def one(s, d):
                seg = hand_segment_vr(d, cam, 0xF, (0.1, config.drangey),
                                      config.segment_scale)
                ci = cnn_input_from_segment(seg.depth, cam.depth_scale,
                                            (0.1, config.drangey))
                return s._replace(prev_frame_error=s.prev_frame_error
                                  + ci.sum() + seg.cam.pose.sum())
            return jax.vmap(one)(states, depth)
        timeit("segment", scan_stage(seg_only), states, depths)

    if on("cnn"):
        from hand_tracking_samples_tpu.cnn.model import forward
        from hand_tracking_samples_tpu.segment.handsegment import (
            cnn_input_from_segment, hand_segment_vr)

        def cnn_only(states, depth):
            def seg_of(d):
                seg = hand_segment_vr(d, cam, 0xF, (0.1, config.drangey),
                                      config.segment_scale)
                return cnn_input_from_segment(seg.depth, cam.depth_scale,
                                              (0.1, config.drangey))
            x = jax.vmap(seg_of)(depth)
            y = forward(cnn_params, x)
            return states._replace(prev_frame_error=states.prev_frame_error
                                   + y.sum(-1))
        timeit("cnn(+seg)", scan_stage(cnn_only), states, depths)

    if on("fiterr"):
        from hand_tracking_samples_tpu.fitting.cloud import fit_error
        from hand_tracking_samples_tpu.imaging.image_ops import (
            cloud_from_depth_planes)

        def fe(states, depth):
            def one(s, d):
                ph = cloud_from_depth_planes(d, cam, 0.1, config.drangey,
                                             config.subsample_fraction,
                                             config.point_budget)
                e = fit_error(s.body, model, None, None, d, cam,
                              config.bone_sum_error_scale, use_kernel=True,
                              points_ph=ph)
                return s._replace(prev_frame_error=s.prev_frame_error + e)
            return jax.vmap(one)(states, depth)
        timeit("fiterr(+cloud)", scan_stage(fe), states, depths)

    def msim_with(cfg, name):
        def ms(states, depth):
            def one(s, d):
                _, a, _, _, vp, vm = rt._cnn_frame_inputs(
                    cnn_params, d, cam, cfg)
                vph = vp if rt._planes_path(cfg) else None
                cpose = jnp.concatenate([jnp.zeros(3),
                                         jnp.asarray([0.0, 0, 0, 1])])
                b = rt.multi_step_sim(s.body, model, a, vp, vm, cpose,
                                      cfg, params, points_ph=vph)
                return s._replace(body=b)
            return jax.vmap(one)(states, depth)
        timeit(name, scan_stage(ms), states, depths)

    if on("msim_i21"):
        import dataclasses
        msim_with(dataclasses.replace(config, physics_iterations=2,
                                      physics_iterations_post=1),
                  "msim_i21(+pro)")

    if on("msim_s1"):
        import dataclasses
        msim_with(dataclasses.replace(config, steps=1), "msim_s1(+pro)")

    if on("msim_s1_nocol"):
        import dataclasses
        msim_with(dataclasses.replace(config, steps=1,
                                      physics_use_collision=0),
                  "msim_s1_nocol")

    if on("msim_s1_nocloud"):
        import dataclasses
        msim_with(dataclasses.replace(config, steps=1, steps_cloudstart=99),
                  "msim_s1_nocld")

    if on("msim_s1_i21"):
        import dataclasses
        msim_with(dataclasses.replace(config, steps=1, physics_iterations=2,
                                      physics_iterations_post=1),
                  "msim_s1_i21")

    if on("msim_s1_zero"):
        # steps=1 with the pair-class planes zeroed (HTS_ZERO_PLANES must be
        # set in the env BEFORE launch): attributes factory+prep cost
        import dataclasses
        assert os.environ.get("HTS_ZERO_PLANES"), "set HTS_ZERO_PLANES=1"
        msim_with(dataclasses.replace(config, steps=1), "msim_s1_zero")

    if on("msim_zero"):
        assert os.environ.get("HTS_ZERO_PLANES"), "set HTS_ZERO_PLANES=1"
        msim_with(config, "msim_zero")

    if on("msubrows"):
        # cloud_rows_packed at the msim subsample budget (the per-step cost)
        from hand_tracking_samples_tpu.ops.cloud_rows import (
            cloud_rows_packed_ph)
        from hand_tracking_samples_tpu.imaging.image_ops import (
            cloud_from_depth_planes, compact_planes)

        def mr(states, depth):
            def one(s, d):
                ph = cloud_from_depth_planes(d, cam, 0.1, config.drangey,
                                             config.subsample_fraction,
                                             config.point_budget)
                vm = ph[4] > 0.5
                vsub = vm & ((jnp.cumsum(vm) - 1) % 4 == 0)
                q = -(-ph.shape[1] // 4)
                msb = max(-(-q // 128) * 128, 128)
                mph = compact_planes(ph, vsub, msb)
                blk, _ = cloud_rows_packed_ph(
                    s.body, model, mph, jnp.zeros(3),
                    jnp.ones(17), config.cloud_rows_per_body)
                return s._replace(prev_frame_error=s.prev_frame_error
                                  + blk.targetdist.sum())
            return jax.vmap(one)(states, depth)
        timeit("msubrows(+cld)", scan_stage(mr), states, depths)

    if on("msim"):
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
        timeit("msim(+prologue)", scan_stage(ms), states, depths)

    if on("contacts"):
        from hand_tracking_samples_tpu.physics.contacts import contact_rows

        def ct(states, depth):
            def one(s, d):
                r = contact_rows(s.body, model, params)
                return s._replace(prev_frame_error=s.prev_frame_error
                                  + r.targetdist.sum() + d[0, 0])
            return jax.vmap(one)(states, depth)
        timeit("contacts x1", scan_stage(ct), states, depths)

    if on("cloudrows"):
        from hand_tracking_samples_tpu.ops.cloud_rows import (
            cloud_rows_packed_ph)
        from hand_tracking_samples_tpu.imaging.image_ops import (
            cloud_from_depth_planes)

        def cr(states, depth):
            def one(s, d):
                ph = cloud_from_depth_planes(d, cam, 0.1, config.drangey,
                                             config.subsample_fraction,
                                             config.point_budget)
                blk, _ = cloud_rows_packed_ph(
                    s.body, model, ph, jnp.zeros(3),
                    jnp.ones(17), config.cloud_rows_per_body)
                return s._replace(prev_frame_error=s.prev_frame_error
                                  + blk.targetdist.sum())
            return jax.vmap(one)(states, depth)
        timeit("cloudrows(+cloud)", scan_stage(cr), states, depths)

    if on("cloud"):
        from hand_tracking_samples_tpu.imaging.image_ops import (
            cloud_from_depth_planes)

        def cl(states, depth):
            def one(s, d):
                ph = cloud_from_depth_planes(d, cam, 0.1, config.drangey,
                                             config.subsample_fraction,
                                             config.point_budget)
                return s._replace(prev_frame_error=s.prev_frame_error
                                  + ph.sum())
            return jax.vmap(one)(states, depth)
        timeit("cloud(planes)", scan_stage(cl), states, depths)

    if on("cloud_legacy"):
        def cl2(states, depth):
            def one(s, d):
                vp, vm = clouds_of(d)
                return s._replace(prev_frame_error=s.prev_frame_error
                                  + vp.sum() + vm.sum())
            return jax.vmap(one)(states, depth)
        timeit("cloud(N,3)", scan_stage(cl2), states, depths)


if __name__ == "__main__":
    main()
