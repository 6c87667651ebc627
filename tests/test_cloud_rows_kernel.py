"""The fused cloud-rows kernel must reproduce the XLA correspondence + pack
path (physmodel.h:137-181 semantics; pack per physics/colored.py).

Runs in Pallas interpret mode on the CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.assets_paths import DEFAULT_ANIMBANK
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.fitting.cloud import (cloud_constraint_rows,
                                                     scale_cloud_forces)
from hand_tracking_samples_tpu.imaging.image_ops import cloud_from_depth
from hand_tracking_samples_tpu.ops.cloud_rows import cloud_rows_packed
from hand_tracking_samples_tpu.physics.colored import pack_single_body_linear
from hand_tracking_samples_tpu.physics.solver import BodyState


def test_cloud_rows_packed_matches_xla_path(hand_model):
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    fid = 123
    depth = jax.jit(lambda p: fake_depth(p, hand_model, cam))(
        jnp.asarray(bank[fid]))
    pts, mask = cloud_from_depth(depth, cam, 0.1, 0.7, 4, 512)
    state = BodyState(pose=jnp.asarray(bank[fid]),
                      linear_momentum=jnp.zeros((17, 3)),
                      angular_momentum=jnp.zeros((17, 3)))
    origin = jnp.zeros(3)
    scale_vec = jnp.where(jnp.arange(17) <= 2, 0.4, 1.0)

    rows = cloud_constraint_rows(state, hand_model, pts, mask, origin=origin)
    rows = scale_cloud_forces(rows, scale_vec[rows.b1])
    blk0 = pack_single_body_linear(rows, 17, 64)

    blk1, dropped = cloud_rows_packed(state, hand_model, pts, mask, origin,
                                      scale_vec, 64)

    a0 = np.asarray(blk0.active)
    a1 = np.asarray(blk1.active)
    assert np.array_equal(a0, a1)
    m = a0
    for f in ("normal", "r1", "targetdist", "fmin", "fmax"):
        x0 = np.asarray(getattr(blk0, f))
        x1 = np.asarray(getattr(blk1, f))
        d = np.abs(x0 - x1)[m]
        assert d.size == 0 or d.max() < 1e-6, f
    # drop accounting: dropped = per-body actives beyond the slot cap
    body_counts = np.bincount(np.asarray(rows.b1)[np.asarray(rows.active)],
                              minlength=17)
    np.testing.assert_array_equal(np.asarray(dropped).astype(int),
                                  np.maximum(body_counts - 64, 0))
