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
                   cam: DCamera, config: TrackerConfig, params=None,
                   run_cnn=None):
    """One frame for all tracks. depths: (T, H, W) uint16."""
    if params is None:
        params = physics_params(config)

    def one(state, depth):
        s, pose_user, _ = update(state, model, cnn_params, depth, cam, config,
                                 params, run_cnn=run_cnn)
        return s, pose_user

    return jax.vmap(one)(states, depths)


def track_sequences(states: TrackerState, model, cnn_params, depth_seqs,
                    cam: DCamera, config: TrackerConfig, params=None):
    """Track T independent sequences of F frames each.

    depth_seqs: (F, T, H, W) — frame-major so the scan carries the per-track
    state recurrence.  Returns (final states, (F, T, 17, 7) user poses).

    When config.cnn_every_k > 1 (and the CNN runs at all), the scan proceeds
    in groups of k frames: CNN + heavy refit on the group's first frame, the
    cheap cloud-only fit on the rest — the reference's background-CNN cadence
    (handtrack.h:45-48, 755-768) made static.
    """
    if params is None:
        params = physics_params(config)
    k = config.cnn_every_k if (config.cnn_every_frame
                               and cnn_params is not None) else 1

    if k <= 1:
        def step(states, depths):
            return batched_update(states, model, cnn_params, depths, cam,
                                  config, params)
        return jax.lax.scan(step, states, depth_seqs)

    F = depth_seqs.shape[0]
    assert F % k == 0, f"frame count {F} must be a multiple of cnn_every_k={k}"
    grouped = depth_seqs.reshape((F // k, k) + depth_seqs.shape[1:])

    def step(states, depths_k):
        poses = []
        for i in range(k):
            states, p = batched_update(states, model, cnn_params,
                                       depths_k[i], cam, config, params,
                                       run_cnn=(i == 0))
            poses.append(p)
        return states, jnp.stack(poses)

    states, poses = jax.lax.scan(step, states, grouped)
    return states, poses.reshape((F,) + poses.shape[2:])


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
