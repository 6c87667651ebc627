"""The tracker's colored fast path must match its sequential path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import (make_tracker_state,
                                                       physics_params, update)
from tests.conftest import quat_err


def test_update_colored_matches_sequential(hand_model):
    bank = load_animbank(__import__("hand_tracking_samples_tpu.assets_paths", fromlist=["DEFAULT_ANIMBANK"]).DEFAULT_ANIMBANK)
    cam = synth_camera()
    base = TrackerConfig(point_budget=2048, cnn_every_frame=False,
                         cloud_rows_per_body=512)  # no row drop -> exact
    params = physics_params(base)
    cfg_seq = dataclasses.replace(base, solver="sequential")
    cfg_col = dataclasses.replace(base, solver="colored")

    s_seq = make_tracker_state(hand_model)
    s_seq = s_seq._replace(body=s_seq.body._replace(pose=jnp.asarray(bank[0])))
    s_col = s_seq
    fd = jax.jit(lambda p: fake_depth(p, hand_model, cam))
    up_seq = jax.jit(lambda s, d: update(s, hand_model, None, d, cam, cfg_seq,
                                         params)[0])
    up_col = jax.jit(lambda s, d: update(s, hand_model, None, d, cam, cfg_col,
                                         params)[0])
    for f in range(3):
        d = fd(jnp.asarray(bank[f]))
        s_seq, s_col = up_seq(s_seq, d), up_col(s_col, d)
        a, b = np.array(s_seq.body.pose), np.array(s_col.body.pose)
        assert np.abs(a[:, :3] - b[:, :3]).max() < 1e-4, f
        assert quat_err(a[:, 3:], b[:, 3:]) < 1e-3, f
