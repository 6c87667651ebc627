"""constrain_cone_angle_batch == per-row constrain_cone_angle, field by
field, on random poses (the batched factory backs apply_angles and the
enhancement cones — tracker/runtime.py)."""
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.physics.constraints import (
    constrain_cone_angle, constrain_cone_angle_batch)
from hand_tracking_samples_tpu.physics.solver import (BodyState, PhysicsParams,
                                                      concat_angular)


def _rand_state(rng, B=17):
    q = rng.randn(B, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    pose = np.concatenate([rng.randn(B, 3).astype(np.float32) * 0.1, q], -1)
    return BodyState(pose=jnp.asarray(pose),
                     linear_momentum=jnp.zeros((B, 3)),
                     angular_momentum=jnp.zeros((B, 3)))


def test_cone_batch_matches_per_row():
    rng = np.random.RandomState(3)
    state = _rand_state(rng)
    params = PhysicsParams()
    K = 12
    b0 = np.asarray([-1, 1, 1, 4, 7, 1, -1, 2, 1, 5, 1, 1], np.int32)
    b1 = np.asarray([0, 4, 6, 9, 12, 15, 1, 3, 16, 8, 10, 13], np.int32)
    n0 = rng.randn(K, 3).astype(np.float32)
    n0 /= np.linalg.norm(n0, axis=-1, keepdims=True)
    n1 = rng.randn(K, 3).astype(np.float32)
    n1 /= np.linalg.norm(n1, axis=-1, keepdims=True)
    lim = np.asarray([0.0, 10, 70, 0, 25, 10, 40, 0, 10, 15, 5, 90],
                     np.float32)

    batch = constrain_cone_angle_batch(state, b0, jnp.asarray(n0), b1,
                                       jnp.asarray(n1), lim, params)
    rows = concat_angular(*[
        constrain_cone_angle(state, jnp.int32(int(b0[k])), jnp.asarray(n0[k]),
                             jnp.int32(int(b1[k])), jnp.asarray(n1[k]),
                             float(lim[k]), params)
        for k in range(K)])

    for name in batch._fields:
        a, b = np.asarray(getattr(batch, name)), np.asarray(getattr(rows, name))
        assert a.shape == b.shape, name
        # fp reassociation only (XLA fuses the batched normalize/arccos
        # differently); spins carry the /deltaT x60 amplification
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5, err_msg=name)
