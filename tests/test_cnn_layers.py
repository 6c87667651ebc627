"""The generic layer library must agree with the fused model and goldens."""
import jax
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.cnn.layers import (Activation, AvgPool, Conv,
                                                  Full, MaxPool, SoftMax,
                                                  SparsePool, Stack,
                                                  pose_initializer_stack)
from hand_tracking_samples_tpu.cnn.model import forward as fused_forward
from hand_tracking_samples_tpu.cnn.model import load_cnnb
from tests.conftest import FIXTURES

CNNB = f"{FIXTURES}/golden_cnn_init.cnnb"


def test_stack_matches_fused_forward(golden):
    stack = pose_initializer_stack()
    params = stack.load_cnnb(CNNB)
    x = jnp.asarray(np.array(golden["cnn_input"], np.float32)).reshape(1, 64, 64)
    y1 = jax.jit(stack.forward)(params, x)[0]
    np.testing.assert_allclose(np.array(y1), golden["cnn_output"], atol=1e-5)
    fused = load_cnnb(CNNB)
    y2 = jax.jit(fused_forward)(fused, x)[0]
    np.testing.assert_allclose(np.array(y1), np.array(y2), atol=1e-5)


def test_stack_sgd_matches_golden(golden):
    stack = pose_initializer_stack()
    params = stack.load_cnnb(CNNB)
    x = jnp.asarray(np.array(golden["cnn_input"], np.float32)).reshape(1, 64, 64)
    t = np.zeros(2304, np.float32)
    for i in range(8):
        t[i * 256 + 37] = 1.0
    for i in range(16):
        t[2048 + i * 16 + 5] = 1.0
    params, mse = stack.sgd_step(params, x, jnp.asarray(t)[None], 0.001)
    assert abs(float(mse) - golden["cnn_train_mse"][0]) < 1e-6
    y = jax.jit(stack.forward)(params, x)[0]
    np.testing.assert_allclose(np.array(y), golden["cnn_output_after_step"],
                               atol=1e-5)


def test_cnnb_roundtrip_stack(tmp_path):
    stack = Stack([Full(8, 16), Activation(16, "relu"), Full(16, 4),
                   SoftMax(4)])
    params = stack.init(jax.random.PRNGKey(1))
    p = str(tmp_path / "s.cnnb")
    stack.save_cnnb(params, p)
    back = stack.load_cnnb(p)
    x = jnp.asarray(np.random.RandomState(0).rand(3, 8).astype(np.float32))
    np.testing.assert_allclose(np.array(stack.forward(params, x)),
                               np.array(stack.forward(back, x)), atol=1e-7)


def test_pool_variants():
    x = jnp.asarray(np.arange(2 * 4 * 4, dtype=np.float32).reshape(1, -1))
    mx = MaxPool((4, 4, 2)).forward({}, x).reshape(2, 2, 2)
    av = AvgPool((4, 4, 2)).forward({}, x).reshape(2, 2, 2)
    sp = SparsePool((4, 4, 2)).forward({}, x).reshape(2, 2, 2)
    img = np.arange(2 * 4 * 4, dtype=np.float32).reshape(2, 4, 4)
    np.testing.assert_allclose(np.array(mx)[0],
                               img[0].reshape(2, 2, 2, 2).max(axis=(1, 3)))
    np.testing.assert_allclose(np.array(av)[0],
                               img[0].reshape(2, 2, 2, 2).mean(axis=(1, 3)))
    np.testing.assert_allclose(np.array(sp)[0], img[0][::2, ::2])
