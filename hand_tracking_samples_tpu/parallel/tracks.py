"""Multi-track batching: the TPU scaling axis.

The reference tracks one hand in real time on one CPU (handtrack.h:45-48).
The TPU design keeps each track's frame-to-frame recurrence (temporal
coherence is load-bearing) and gets throughput by running hundreds of
independent tracks per chip: vmap over a `tracks` axis, lax.scan over time,
shard_map over a device mesh for multi-chip.

Everything here composes the pure per-track functions from tracker.runtime.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..imaging.camera import DCamera
from ..tracker.config import TrackerConfig
from ..tracker.runtime import TrackerState, make_tracker_state, physics_params, update


def batched_tracker_state(model, n_tracks: int) -> TrackerState:
    one = make_tracker_state(model)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n_tracks,) + x.shape), one)


def batched_update(states: TrackerState, model, cnn_params, depths,
                   cam: DCamera, config: TrackerConfig, params=None):
    """One frame for all tracks. depths: (T, H, W) uint16."""
    if params is None:
        params = physics_params(config)

    def one(state, depth):
        s, pose_user, _ = update(state, model, cnn_params, depth, cam, config,
                                 params)
        return s, pose_user

    return jax.vmap(one)(states, depths)


def track_sequences(states: TrackerState, model, cnn_params, depth_seqs,
                    cam: DCamera, config: TrackerConfig, params=None):
    """Track T independent sequences of F frames each.

    depth_seqs: (F, T, H, W) — frame-major so the scan carries the per-track
    state recurrence.  Returns (final states, (F, T, 17, 7) user poses).
    """
    if params is None:
        params = physics_params(config)

    def step(states, depths):
        states, poses = batched_update(states, model, cnn_params, depths, cam,
                                       config, params)
        return states, poses

    return jax.lax.scan(step, states, depth_seqs)


def sharded_track_sequences(mesh: Mesh, states, model, cnn_params, depth_seqs,
                            cam, config: TrackerConfig, axis: str = "tracks"):
    """Multi-chip scale-out: shard the track axis over the mesh.

    Tracking is embarrassingly parallel across tracks — each device holds its
    tracks' state and depth stream; zero collectives on the hot path (the
    scaling-book recipe degenerates to pure data parallelism here, which is
    the correct answer, not a simplification).
    """
    params = physics_params(config)
    spec_state = jax.tree.map(lambda _: P(axis), states)
    in_specs = (spec_state, P(None, axis))
    out_specs = (spec_state, P(None, axis))

    from jax.experimental.shard_map import shard_map

    def local(states, depth_seqs):
        return track_sequences(states, model, cnn_params, depth_seqs, cam,
                               config, params)

    fn = shard_map(local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)
    return fn(states, depth_seqs)
