"""Recorded-format replay parity (VERDICT r1 item 5).

tests/fixtures/replay_rec.{rs,pose,json,ir} was written by this framework's
DatasetWriter; the reference (via tools/golden_gen.cpp) loads it with
dataset.h load_dataset and tracks it dynamics-only.  Replaying the same file
through our runtime must reproduce the reference trajectory — proving both
on-disk format interop and tracking parity on recordings.
"""
import jax
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.data.dataset import load_dataset
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import (make_tracker_state,
                                                       physics_params, update)
from tests.conftest import FIXTURES


def test_replay_recording_parity(golden, hand_model):
    ds = load_dataset(f"{FIXTURES}/replay_rec")
    cam = ds.info.camera()
    n = int(golden["replay_n_frames"][0])
    assert n == len(ds.depth)
    ref = np.array(golden["replay_dyntrack_poses"], np.float32).reshape(
        n, 17, 7)

    config = TrackerConfig(point_budget=2048, cnn_every_frame=False)
    params = physics_params(config)
    state = make_tracker_state(hand_model)
    state = state._replace(body=state.body._replace(
        pose=jnp.asarray(ds.pose[0])))
    step = jax.jit(lambda s, d: update(s, hand_model, None, d, cam, config,
                                       params)[0])
    for f in range(n):
        state = step(state, jnp.asarray(ds.depth[f]))
        mine = np.asarray(state.body.pose)
        dev = np.linalg.norm(mine[:, :3] - ref[f, :, :3], axis=1)
        assert dev.mean() < 1.0e-3, f"frame {f}: {dev.mean()*1000:.2f}mm"
