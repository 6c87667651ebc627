import numpy as np
import jax.numpy as jnp

from hand_tracking_samples_tpu.maths.quat import (
    qmul, qrot, quat_from_to, qxdir, qydir, qzdir, qnormalize, qconj, qmat)
from hand_tracking_samples_tpu.maths.pose import (
    pose, pose_apply, pose_inverse, pose_mul, transform_plane)


def test_qmul_golden(golden):
    q0 = qnormalize(jnp.asarray([0.2, -0.3, 0.5, 0.79], jnp.float32))
    q1 = qnormalize(jnp.asarray([-0.1, 0.62, 0.15, 0.5], jnp.float32))
    np.testing.assert_allclose(qmul(q0, q1), golden["qmul"], atol=1e-5)


def test_qrot_golden(golden):
    q0 = qnormalize(jnp.asarray([0.2, -0.3, 0.5, 0.79], jnp.float32))
    r = qrot(q0, jnp.asarray([0.3, -0.7, 1.1], jnp.float32))
    np.testing.assert_allclose(r, golden["qrot"], atol=1e-5)


def test_quat_from_to_golden(golden):
    q = quat_from_to(jnp.asarray([0.3, 0.2, 0.93]), jnp.asarray([-0.5, 0.7, 0.1]))
    np.testing.assert_allclose(q, golden["quat_from_to"], atol=1e-5)


def test_qdirs_match_qmat():
    q = qnormalize(jnp.asarray([0.1, 0.4, -0.2, 0.88]))
    m = qmat(q)
    np.testing.assert_allclose(m[:, 0], qxdir(q), atol=1e-6)
    np.testing.assert_allclose(m[:, 1], qydir(q), atol=1e-6)
    np.testing.assert_allclose(m[:, 2], qzdir(q), atol=1e-6)
    v = jnp.asarray([0.3, -1.2, 0.5])
    np.testing.assert_allclose(m @ v, qrot(q, v), atol=1e-6)


def test_pose_roundtrip():
    p = pose(jnp.asarray([0.1, -0.2, 0.3]),
             qnormalize(jnp.asarray([0.3, 0.1, -0.4, 0.85])))
    v = jnp.asarray([0.5, 0.6, -0.7])
    np.testing.assert_allclose(pose_apply(pose_inverse(p), pose_apply(p, v)),
                               v, atol=1e-6)
    np.testing.assert_allclose(pose_mul(p, pose_inverse(p)),
                               jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), atol=1e-6)


def test_transform_plane():
    p = pose(jnp.asarray([0.1, -0.2, 0.3]),
             qnormalize(jnp.asarray([0.3, 0.1, -0.4, 0.85])))
    plane = jnp.asarray([0.0, 0.0, 1.0, -0.5])
    wp = transform_plane(p, plane)
    # a point on the original plane, transformed, lies on the new plane
    x = jnp.asarray([0.2, 0.7, 0.5])
    xw = pose_apply(p, x)
    d = jnp.dot(wp[:3], xw) + wp[3]
    assert abs(float(d)) < 1e-6
