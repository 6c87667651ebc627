"""Composable CNN layer library — the general engine behind cnn/model.py.

The reference cnn.h is a generic layer stack (LConv, LConvS, LFull, pools,
activations, softmax variants) with per-layer weight serialization; the
fixed pose-initialiser network is just one stack of it (handtrack.h:103-130).
This module provides the same generality the TPU way: each layer is a spec
with init/forward and .cnnb-layout pack/unpack; a Stack composes them into a
batched forward and a jax.grad SGD step whose gradient equals CNN::Train's
backward/update pass (see cnn/model.py for the derivation).

Tensors between layers are flat (batch, n) vectors in the reference's
z-major layout (x fastest), so weight files interoperate layer by layer.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp


class Layer:
    """Base: stateless spec. Params are dicts of arrays (possibly empty)."""
    n_out: int

    def init(self, key):
        return {}

    def forward(self, params, x):  # x: (B, n_in) -> (B, n_out)
        raise NotImplementedError

    def cnnb_arrays(self, params):
        """Arrays in reference .cnnb order (W then B), or []."""
        return []

    def cnnb_load(self, raw, off):
        """Consume floats from raw starting at off; return (params, off)."""
        return {}, off


def _xavier(key, shape, fan_in, fan_out):
    r = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -r, r)


@dataclasses.dataclass
class Conv(Layer):
    """LConv (cnn.h:194-290): VALID cross-correlation.
    indims/outdims are (x, y, z); kernel (kx, ky, zin, zout)."""
    indims: tuple
    kernel: tuple
    outdims: tuple

    def __post_init__(self):
        self.n_out = int(np.prod(self.outdims))

    def init(self, key):
        kx, ky, zin, zout = self.kernel
        w = _xavier(key, (ky, kx, zin, zout), kx * ky * zin, kx * ky * zout)
        return {"w": w, "b": jnp.zeros(zout, jnp.float32)}

    def forward(self, params, x):
        ix, iy, iz = self.indims
        h = x.reshape(-1, iz, iy, ix).transpose(0, 2, 3, 1)  # NHWC
        h = jax.lax.conv_general_dilated(
            h, params["w"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + params["b"]
        return h.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)

    def cnnb_arrays(self, params):
        w = np.transpose(np.asarray(params["w"]), (3, 2, 0, 1))  # zout,zin,ky,kx
        return [w.reshape(-1), np.asarray(params["b"]).reshape(-1)]

    def cnnb_load(self, raw, off):
        kx, ky, zin, zout = self.kernel
        n = kx * ky * zin * zout
        w = raw[off:off + n].reshape(zout, zin, ky, kx).transpose(2, 3, 1, 0)
        off += n
        b = raw[off:off + zout]
        off += zout
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}, off


@dataclasses.dataclass
class ConvS(Layer):
    """LConvS (cnn.h:292-396): SAME-size radius conv with optional stride on
    the kernel offsets (the reference strides the OFFSETS, not the output)."""
    rdims: tuple           # (x, y)
    din: int
    dout: int
    radius: tuple = (1, 1)
    stride: tuple = (1, 1)

    def __post_init__(self):
        self.n_out = self.rdims[0] * self.rdims[1] * self.dout

    def _wdims(self):
        return (2 * self.radius[0] + 1, 2 * self.radius[1] + 1, self.din,
                self.dout)

    def init(self, key):
        kx, ky, zin, zout = self._wdims()
        w = _xavier(key, (ky, kx, zin, zout), kx * ky * zin, kx * ky * zout)
        return {"w": w, "b": jnp.zeros(zout, jnp.float32)}

    def forward(self, params, x):
        ix, iy = self.rdims
        h = x.reshape(-1, self.din, iy, ix).transpose(0, 2, 3, 1)
        kx, ky, _, _ = self._wdims()
        # offsets stride = dilated taps at (p - radius) * stride
        h = jax.lax.conv_general_dilated(
            h, params["w"], (1, 1),
            padding=[(self.radius[1] * self.stride[1],) * 2,
                     (self.radius[0] * self.stride[0],) * 2],
            rhs_dilation=(self.stride[1], self.stride[0]),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + params["b"]
        return h.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)

    def cnnb_arrays(self, params):
        w = np.transpose(np.asarray(params["w"]), (3, 2, 0, 1))
        return [w.reshape(-1), np.asarray(params["b"]).reshape(-1)]

    def cnnb_load(self, raw, off):
        kx, ky, zin, zout = self._wdims()
        n = kx * ky * zin * zout
        w = raw[off:off + n].reshape(zout, zin, ky, kx).transpose(2, 3, 1, 0)
        off += n
        b = raw[off:off + zout]
        off += zout
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}, off


@dataclasses.dataclass
class Full(Layer):
    """LFull (cnn.h:398-456): dense layer, W[j + i*N] layout."""
    n_in: int
    n_out: int

    def init(self, key):
        return {"w": _xavier(key, (self.n_in, self.n_out), self.n_in,
                             self.n_out),
                "b": jnp.zeros(self.n_out, jnp.float32)}

    def forward(self, params, x):
        return x @ params["w"] + params["b"]

    def cnnb_arrays(self, params):
        return [np.asarray(params["w"]).reshape(-1),
                np.asarray(params["b"]).reshape(-1)]

    def cnnb_load(self, raw, off):
        n = self.n_in * self.n_out
        w = raw[off:off + n].reshape(self.n_in, self.n_out)
        off += n
        b = raw[off:off + self.n_out]
        off += self.n_out
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}, off


@dataclasses.dataclass
class Activation(Layer):
    """LActivation<TanH|Sigmoid|ReLU|LeakyReLU> (cnn.h:24-43, 457-470)."""
    n: int
    kind: str = "tanh"

    def __post_init__(self):
        self.n_out = self.n

    def forward(self, params, x):
        if self.kind == "tanh":
            return jnp.tanh(x)
        if self.kind == "sigmoid":
            return jax.nn.sigmoid(x)
        if self.kind == "relu":
            return jnp.maximum(x, 0.0)
        if self.kind == "leakyrelu":
            return jnp.maximum(0.01 * x, x)
        raise ValueError(self.kind)


@dataclasses.dataclass
class _Pool(Layer):
    indims: tuple  # (x, y, z)

    def __post_init__(self):
        ix, iy, iz = self.indims
        self.n_out = (ix // 2) * (iy // 2) * iz

    def _img(self, x):
        ix, iy, iz = self.indims
        return x.reshape(-1, iz, iy, ix)


class MaxPool(_Pool):
    """LMaxPool 2x2 (cnn.h:136-165)."""

    def forward(self, params, x):
        h = self._img(x)
        b, z, y, xx = h.shape
        h = h.reshape(b, z, y // 2, 2, xx // 2, 2).max(axis=(3, 5))
        return h.reshape(x.shape[0], -1)


class AvgPool(_Pool):
    """LAvgPool 2x2 (cnn.h:113-135)."""

    def forward(self, params, x):
        h = self._img(x)
        b, z, y, xx = h.shape
        h = h.reshape(b, z, y // 2, 2, xx // 2, 2).mean(axis=(3, 5))
        return h.reshape(x.shape[0], -1)


class SparsePool(_Pool):
    """LSparsePool 2x2 (cnn.h:166-193): keep the top-left sample."""

    def forward(self, params, x):
        h = self._img(x)
        h = h[:, :, ::2, ::2]
        return h.reshape(x.shape[0], -1)


@dataclasses.dataclass
class SoftMax(Layer):
    """LSoftMax (cnn.h:471-492)."""
    n: int

    def __post_init__(self):
        self.n_out = self.n

    def forward(self, params, x):
        return jax.nn.softmax(x, axis=-1)


@dataclasses.dataclass
class SoftMaxChunked(Layer):
    """LSoftMaxChunked (cnn.h:493-528): independent softmax per span."""
    spans: tuple

    def __post_init__(self):
        self.n_out = sum(self.spans)

    def forward(self, params, x):
        outs = []
        off = 0
        for s in self.spans:
            outs.append(jax.nn.softmax(x[:, off:off + s], axis=-1))
            off += s
        return jnp.concatenate(outs, axis=-1)


@dataclasses.dataclass
class CrossEntropy(Layer):
    """LCrossEntropy (cnn.h:529-547): stabilised softmax forward whose
    backward passes the error straight through (i.e. training against it
    descends sum(softmax) CE when targets are one-hot)."""
    n: int

    def __post_init__(self):
        self.n_out = self.n

    def forward(self, params, x):
        return jax.nn.softmax(x, axis=-1)


class Stack:
    """CNN (cnn.h:100, 548-604): a layer list with Eval/Train/load/save."""

    def __init__(self, layers: Sequence[Layer]):
        self.layers = list(layers)

    def init(self, key):
        keys = jax.random.split(key, len(self.layers))
        return [l.init(k) for l, k in zip(self.layers, keys)]

    def forward(self, params, x):
        h = x.reshape(x.shape[0], -1)
        for l, p in zip(self.layers, params):
            h = l.forward(p, h)
        return h

    def loss(self, params, x, t):
        """0.5*sum((y-t)^2): the objective CNN::Train descends."""
        y = self.forward(params, x)
        e = y - t
        return 0.5 * jnp.sum(e * e), y

    def sgd_step(self, params, x, t, alpha):
        (loss, y), grads = jax.value_and_grad(self.loss, has_aux=True)(
            params, x, t)
        params = jax.tree.map(lambda p, g: p - alpha * g, params, grads)
        mse = jnp.mean((y - t) ** 2, axis=-1).mean()
        return params, mse

    def save_cnnb(self, params, path):
        arrays = []
        for l, p in zip(self.layers, params):
            arrays += l.cnnb_arrays(p)
        np.concatenate([np.asarray(a, np.float32) for a in arrays]
                       or [np.zeros(0, np.float32)]).tofile(path)

    def load_cnnb(self, path):
        raw = np.fromfile(path, dtype=np.float32)
        params, off = [], 0
        for l in self.layers:
            p, off = l.cnnb_load(raw, off)
            params.append(p)
        assert off == len(raw), (off, len(raw))
        return params


def pose_initializer_stack() -> Stack:
    """The PoseInitializerCNN architecture (handtrack.h:103-130) expressed in
    the generic layer library (cnn/model.py is its fused fast path)."""
    return Stack([
        Conv((64, 64, 1), (5, 5, 1, 16), (60, 60, 16)),
        Activation(60 * 60 * 16, "tanh"),
        MaxPool((60, 60, 16)),
        MaxPool((30, 30, 16)),
        Conv((15, 15, 16), (4, 4, 16, 64), (12, 12, 64)),
        Activation(12 * 12 * 64, "tanh"),
        MaxPool((12, 12, 64)),
        Full(6 * 6 * 64, 16 * 16 * 8),
        Activation(16 * 16 * 8, "tanh"),
        Full(16 * 16 * 8, 16 * 16 * 8 + 16 * 16),
        SoftMaxChunked(tuple([256] * 8 + [16] * 16)),
    ])
