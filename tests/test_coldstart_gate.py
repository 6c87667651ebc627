"""Cold-start quality gate (VERDICT r2 item 2 / weak 7): a regression in the
reset/kickstart/accept path must turn a test red, not ship silently.

The full 64-start x 64-frame protocol runs on the TPU via
tools/eval_coldstart.py (current default config: mean 7.51 mm / 72% < 8 mm vs
the reference's 8.21 mm / 72%, tests/fixtures/coldstart_ref.json, identical
protocol via golden_gen GG_COLDSTART).  On the CPU mesh that protocol is ~1 h,
so this gate runs a calibrated 8-start x 8-frame slice of it (every 8th
start) with the shipped defaults: acquisition from the rest pose must reach
the tracking regime within 8 CNN frames.

Calibrated (CPU, colored): per-frame mean 21.5 -> 3.8 mm, 6/8 converged by
frame 7, finals [0.9 0.6 0.5 0.5 8.4 1.5 17.3 0.6] mm.  The bands below hold
with ~2x headroom; a broken reset path sits at 15-25 mm mean.
"""
import numpy as np
import jax
import jax.numpy as jnp

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                    DEFAULT_CNNB)
from hand_tracking_samples_tpu.cnn.model import load_cnnb
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import synth_camera
from hand_tracking_samples_tpu.parallel.tracks import (batched_tracker_state,
                                                       batched_update)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params
from tests.conftest import cached_fake_depths


def test_coldstart_acquisition(hand_model):
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    cnn = load_cnnb(DEFAULT_CNNB)
    T, F = 8, 8
    starts = ((np.arange(0, 64, 8)) * 211) % (len(bank) - 64)
    fids = starts[None, :] + np.arange(F)[:, None]
    depths = cached_fake_depths(hand_model, bank[fids], "cs8")
    config = TrackerConfig(cnn_every_frame=True, solver="colored")
    params = physics_params(config)
    states = batched_tracker_state(hand_model, T)
    states = states._replace(initializing=jnp.full(T, 50, jnp.int32))
    run = jax.jit(lambda s, d: batched_update(
        s, hand_model, cnn, d, cam, config, params)[0])
    means = []
    for f in range(F):
        states = run(states, jnp.asarray(depths[f]))
        e = np.linalg.norm(np.asarray(states.body.pose)[:, :, :3]
                           - bank[fids[f]][:, :, :3], axis=-1).mean(-1)
        means.append(e.mean())
    assert means[0] < 0.045, f"frame-0 acquisition {means[0]*1000:.1f}mm"
    assert means[-1] < 0.0075, f"frame-7 mean {means[-1]*1000:.1f}mm"
    assert np.median(e) < 0.003, f"frame-7 median {np.median(e)*1000:.1f}mm"
    assert (e < 0.008).sum() >= 5, (
        f"only {(e < 0.008).sum()}/8 starts converged: {np.round(e*1000,1)}")
    # acquisition must actually progress (catches a dead accept/reset path)
    assert means[-1] < 0.4 * means[0]
