"""Device-mesh helpers: data-parallel training and sharded tracking.

Parallelism strategy (SURVEY.md §2 checklist): the tracker is embarrassingly
parallel across tracks (per-track state is 17 poses + momenta; zero
cross-chip communication on the hot path); training is plain data parallel
(the CNN is 9.4M params — no TP/PP/SP/EP is warranted).  Gradients
all-reduce over ICI via jit's partitioner; dataset shards ride DCN.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis: str = "data", n: int | None = None) -> Mesh:
    devs = jax.devices() if n is None else jax.devices()[:n]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a batch pytree with its leading axis split over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_dp_train_step(mesh: Mesh, alpha: float, axis: str = "data"):
    """Data-parallel CNN SGD step: params replicated, batch sharded.
    jit + shardings insert the gradient all-reduce (psum over ICI)."""
    from ..cnn.model import sgd_step

    @partial(jax.jit,
             out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())))
    def step(params, x, t):
        return sgd_step(params, x, t, alpha)

    def run(params, x, t):
        params = replicate(mesh, params)
        x = shard_batch(mesh, x, axis)
        t = shard_batch(mesh, t, axis)
        return step(params, x, t)

    return run
