"""Pose-initialiser CNN: batched JAX forward/backward + .cnnb weight I/O.

The fixed architecture of PoseInitializerCNN (include/handtrack.h:103-130):

    64x64x1 -> conv5x5(16) -> tanh -> maxpool -> maxpool
            -> conv4x4(16->64) -> tanh -> maxpool
            -> fc(2304->2048) -> tanh -> fc(2048->2304)
            -> chunked softmax (8 chunks of 256, 16 chunks of 16)

The reference trains one example per step with SGD on the loss
0.5*sum((softmax(z)-t)^2) — its backward injects e = y - t at the output and
runs it through the softmax VJP (third_party/cnn.h:558-580), which is exactly
the gradient of that loss.  Here the whole thing is jax.grad over a batch,
MXU-batched instead of SSE-vectorised.

Weight-file compatibility: load_cnnb/save_cnnb read/write the reference's
binary format (per layer: raw float32 W then B, third_party/cnn.h:97-98,
588-593) so nets trained in either framework transfer.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

KEY_ANGLES = 16          # handtrack.h:72
N_HEATMAPS = 8
HM = 16                  # heatmap side
OUT = N_HEATMAPS * HM * HM + KEY_ANGLES * HM  # 2304
SPANS = [HM * HM] * N_HEATMAPS + [HM] * KEY_ANGLES


def init_params(key, dtype=jnp.float32):
    """Xavier-uniform init with the reference's fan computation
    (cnn.h:280-285, 446-450); RNG is JAX's, not std::default_random_engine."""
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def xavier(key, shape, fan_in, fan_out):
        r = np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -r, r)

    return {
        "conv1": {"w": xavier(k1, (5, 5, 1, 16), 5 * 5 * 1, 5 * 5 * 16),
                  "b": jnp.zeros(16, dtype)},
        "conv2": {"w": xavier(k2, (4, 4, 16, 64), 4 * 4 * 16, 4 * 4 * 64),
                  "b": jnp.zeros(64, dtype)},
        "fc1": {"w": xavier(k3, (2304, 2048), 2304, 2048),
                "b": jnp.zeros(2048, dtype)},
        "fc2": {"w": xavier(k4, (2048, OUT), 2048, OUT),
                "b": jnp.zeros(OUT, dtype)},
    }


def _maxpool2(x):
    """2x2 max pool, NHWC."""
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def chunked_softmax(z):
    """LSoftMaxChunked forward (cnn.h:493-511): independent softmax per span.
    z: (..., 2304)."""
    hm = z[..., : N_HEATMAPS * HM * HM].reshape(z.shape[:-1] + (N_HEATMAPS, HM * HM))
    an = z[..., N_HEATMAPS * HM * HM:].reshape(z.shape[:-1] + (KEY_ANGLES, HM))
    hm = jax.nn.softmax(hm, axis=-1)
    an = jax.nn.softmax(an, axis=-1)
    return jnp.concatenate(
        [hm.reshape(z.shape[:-1] + (-1,)), an.reshape(z.shape[:-1] + (-1,))],
        axis=-1)


def forward(params, x, compute_dtype=None):
    """Batched forward. x: (B, 64, 64) float in [0,1]. Returns (B, 2304)
    post-softmax activations identical to CNN::Eval (cnn.h:550-556)."""
    cd = compute_dtype or x.dtype
    h = x[..., None].astype(cd)  # NHWC
    p = jax.tree.map(lambda a: a.astype(cd), params)
    h = jax.lax.conv_general_dilated(
        h, p["conv1"]["w"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + p["conv1"]["b"]
    h = jnp.tanh(h)
    h = _maxpool2(_maxpool2(h))
    h = jax.lax.conv_general_dilated(
        h.astype(cd), p["conv2"]["w"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + p["conv2"]["b"]
    h = jnp.tanh(h)
    h = _maxpool2(h)
    # reference flattening is z-major (x fastest): NHWC -> NCHW -> flat
    h = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
    h = jnp.tanh(h.astype(cd) @ p["fc1"]["w"] + p["fc1"]["b"])
    z = h.astype(cd) @ p["fc2"]["w"] + p["fc2"]["b"]
    return chunked_softmax(z.astype(jnp.float32))


def loss_fn(params, x, target):
    """0.5*sum_e (y - t)^2 per example, summed over batch — the exact
    objective whose gradient CNN::Train descends (cnn.h:566-575)."""
    y = forward(params, x)
    e = y - target
    return 0.5 * jnp.sum(e * e), y


def sgd_step(params, x, target, alpha):
    """One batched SGD step. With batch size 1 this reproduces CNN::Train
    exactly (including its reported mean-square error)."""
    (loss, y), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, x, target)
    params = jax.tree.map(lambda p, g: p - alpha * g, params, grads)
    e = y - target
    mse = jnp.mean(e * e, axis=-1).mean()
    return params, mse


# ---------------------------------------------------------------------------
# .cnnb weight-file compatibility
# ---------------------------------------------------------------------------

_LAYOUT = [
    ("conv1", (5, 5, 1, 16)),    # reference dims {kx,ky,zin,zout}
    ("conv2", (4, 4, 16, 64)),
    ("fc1", (2304, 2048)),
    ("fc2", (2048, OUT)),
]


def load_cnnb(path) -> dict:
    raw = np.fromfile(path, dtype=np.float32)
    params = {}
    off = 0
    for name, dims in _LAYOUT:
        if len(dims) == 4:
            kx, ky, zin, zout = dims
            n = kx * ky * zin * zout
            # packed x-fastest: index = kx + ky*KX + zin*KX*KY + zout*KX*KY*ZIN
            w = raw[off:off + n].reshape(zout, zin, ky, kx)
            w = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
            off += n
            b = raw[off:off + zout]
            off += zout
        else:
            m, nn = dims
            n = m * nn
            w = raw[off:off + n].reshape(m, nn)  # W[j + i*N] -> (M, N)
            off += n
            b = raw[off:off + nn]
            off += nn
        params[name] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    assert off == len(raw), (off, len(raw))
    return params


def save_cnnb(params, path):
    out = []
    for name, dims in _LAYOUT:
        w = np.asarray(params[name]["w"], np.float32)
        b = np.asarray(params[name]["b"], np.float32)
        if len(dims) == 4:
            w = np.transpose(w, (3, 2, 0, 1))  # HWIO -> (zout, zin, ky, kx)
        out.append(w.reshape(-1))
        out.append(b.reshape(-1))
    np.concatenate(out).tofile(path)
