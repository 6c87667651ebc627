"""The SHIPPED bench configuration is parity-gated (VERDICT r2 items 3+4).

bench.py's defaults are solver="kernel", point_budget=2048,
cloud_rows_per_body=128, use_pallas, 16+4 iterations.  On the CPU mesh the
compiled-kernel route isn't available, so the gate decomposes:

  1. the bench row structure (colored schedule + per-body slot pack at the
     bench budget/cap) must track the C++ reference's 30-frame dyntrack
     golden inside the BASELINE band, and its fast-segment drift golden
     (tests/fixtures/fastdrift_ref.json, GG_FASTDRIFT) per track;
  2. the PGS kernel (interpret mode) must match the colored solver at the
     bench's EXACT 16+4 iterations — not just the quick 2+1 check of
     test_pgs_kernel.

Together these pin the exact shipped bench configuration to the reference
trajectory; bench.py additionally prints the measured fast-segment drift
next to the reference's every run.  Depth renders are cached in
fixtures/cache (content-hashed) because CPU ray-casting dominates otherwise.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.assets_paths import DEFAULT_ANIMBANK
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import synth_camera
from hand_tracking_samples_tpu.parallel.tracks import (batched_tracker_state,
                                                       batched_update)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params
from tests.conftest import FIXTURES, cached_fake_depths, quat_err

import pytest

BENCH_BUDGET = 2048   # bench.py defaults — keep in sync
BENCH_CAP = 128

cam_g = synth_camera()


@pytest.fixture(scope="module")
def bank():
    return load_animbank(DEFAULT_ANIMBANK)


def _bench_row_config(**kw):
    return TrackerConfig(point_budget=BENCH_BUDGET, cnn_every_frame=False,
                         cloud_rows_per_body=BENCH_CAP, **kw)


def test_bench_config_dyntrack_golden(golden, hand_model, bank):
    """Bench row structure vs the 30-frame dyntrack golden: per-frame mean
    joint deviation < 1.2 mm, overall mean <= 1.0 mm (the BASELINE gate at
    the SHIPPED budget/cap instead of the uncapped config of
    test_tracker_e2e).  Calibrated headroom: measured devs 0.09-0.86 mm."""
    config = _bench_row_config(solver="colored")
    params = physics_params(config)
    # the committed golden now runs 64 frames (GG_NDYN, r5); this CPU gate
    # keeps the 30-frame window — the full horizon is pinned on the real
    # chip by eval/dyntrack_kernel_r*.json (test_eval_artifacts)
    ref = np.array(golden["dyntrack_poses"],
                   np.float32).reshape(-1, 17, 7)[:30]
    depths = cached_fake_depths(hand_model, np.asarray(bank[:30])[:, None],
                                "dyn30")
    states = batched_tracker_state(hand_model, 1)
    states = states._replace(body=states.body._replace(
        pose=jnp.asarray(bank[0])[None]))
    step = jax.jit(lambda s, d: batched_update(
        s, hand_model, None, d, cam_g, config, params)[0])
    devs = []
    for f in range(30):
        states = step(states, jnp.asarray(depths[f]))
        mine = np.asarray(states.body.pose[0])
        dev = np.linalg.norm(mine[:, :3] - ref[f, :, :3], axis=1).mean()
        devs.append(dev)
        assert dev < 1.2e-3, f"frame {f}: {dev*1000:.2f}mm"
        je = np.linalg.norm(mine[:, :3] - bank[f][:, :3], axis=1).mean()
        assert je < 1.25 * golden["dyntrack_joint_err"][f] + 5e-4, f
    assert np.mean(devs) <= 1.0e-3


def test_bench_config_fastdrift_golden(hand_model, bank):
    """Bench row structure on the bench's own fast-segment protocol (first 8
    start offsets, 32 frames) vs the C++ reference's measured drift
    (fastdrift_ref.json).  Fast segments are chaotic, so converged tracks
    gate tightly and diverged ones loosely; the aggregate ratio pins the
    overall drift level.  Calibrated: ours/ref finals 18.9/18.6 1.6/1.6
    0.6/0.6 90/100 40/42 5.0/5.2 8.8/8.9 44/40 (mm)."""
    fdref = json.load(open(f"{FIXTURES}/fastdrift_ref.json"))
    T, F = 8, fdref["n_frames"]
    config = _bench_row_config(solver="colored")
    params = physics_params(config)
    starts = (np.arange(T) * 37) % (len(bank) - F)
    fids = starts[None, :] + np.arange(F)[:, None]
    depths = cached_fake_depths(hand_model, np.asarray(bank[fids]), "fd8")
    states = batched_tracker_state(hand_model, T)
    states = states._replace(body=states.body._replace(
        pose=jnp.asarray(bank[fids[0]])))
    step = jax.jit(lambda s, d: batched_update(
        s, hand_model, None, d, cam_g, config, params)[0])
    for f in range(F):
        states = step(states, jnp.asarray(depths[f]))
    fin = np.linalg.norm(np.asarray(states.body.pose)[:, :, :3]
                         - bank[fids[-1]][:, :, :3], axis=-1).mean(-1)
    ref = np.array(fdref["final_err_per_track"])[:T]
    for t in range(T):
        if ref[t] < 0.02:   # converged in the reference: must converge too
            assert abs(fin[t] - ref[t]) < max(0.004, 0.5 * ref[t]), (
                f"track {t}: ours {fin[t]*1000:.1f}mm ref {ref[t]*1000:.1f}mm")
        else:               # drift regime: same level, chaos tolerance
            assert fin[t] < 1.6 * ref[t] + 0.01, (
                f"track {t}: ours {fin[t]*1000:.1f}mm ref {ref[t]*1000:.1f}mm")
    ratio = fin.mean() / ref.mean()
    assert 0.6 < ratio < 1.4, f"aggregate drift ratio {ratio:.2f}"


def test_kernel_matches_colored_at_bench_iterations(hand_model, bank):
    """PGS kernel (interpret) == colored at the bench's EXACT 16+4
    iterations and slot cap (VERDICT r2 weak 3: this equivalence was only
    auto-tested at 2+1).  One batched frame; budget kept at 512 points so
    interpret mode stays tractable — iteration count, not row count, is what
    the 2+1 test under-covered."""
    poses = jnp.asarray(bank[[10, 400]])
    depths = jnp.asarray(cached_fake_depths(
        hand_model, np.asarray(bank[[10, 400]]), "pgs2"))

    def run(solver):
        config = TrackerConfig(point_budget=512, cnn_every_frame=False,
                               cloud_rows_per_body=BENCH_CAP, solver=solver,
                               physics_iterations=16,
                               physics_iterations_post=4)
        params = physics_params(config)
        states = batched_tracker_state(hand_model, 2)
        states = states._replace(body=states.body._replace(pose=poses))
        st, _ = jax.jit(lambda s, d: batched_update(
            s, hand_model, None, d, cam_g, config, params))(states, depths)
        return np.asarray(st.body.pose)

    col = run("colored")
    ker = run("kernel")
    assert np.abs(col[..., :3] - ker[..., :3]).max() < 2e-5
    assert quat_err(col[..., 3:].reshape(-1, 4),
                    ker[..., 3:].reshape(-1, 4)) < 2e-4
