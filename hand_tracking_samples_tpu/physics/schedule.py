"""Static row-schedule assembly for the colored solver.

Builds, once per model (host side), the precedence-preserving colorings and
one-hot application matrices for every statically-structured row class:
joint nailed rows, joint angular-range rows, contact rows, and the CNN
drive/cone rows.  Dynamic single-body rows (cloud, boundary, rays) are packed
per solve by physics/colored.pack_single_body_linear.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from .colored import (StaticPairAngular, StaticPairLinear,
                      make_static_pair_angular, make_static_pair_linear,
                      precedence_coloring)
from .solver import AngularRows, LinearRows


class HandSchedule(NamedTuple):
    """Host-computed static schedules, keyed by row class."""
    joint_lin_groups: tuple      # groups over 3*n_joints nailed rows
    joint_lin_onehots: tuple     # (onehot0 tuple, onehot1 tuple)
    joint_ang_groups: tuple      # groups over 6*n_joints angular rows
    joint_ang_onehots: tuple
    contact_groups: tuple        # groups over 3*n_pairs contact rows
    contact_onehots: tuple
    apply_angles_groups: tuple   # groups over the 12 ApplyAngles rows
    apply_angles_onehots: tuple
    enh_cone_groups: tuple       # armdir cone (single row, world->0)
    enh_cone_onehots: tuple


def _schedule(b0, b1, n_bodies):
    groups = precedence_coloring(list(zip(b0, b1)))
    gi, o0, o1 = [], [], []
    for g in groups:
        gi.append(np.asarray(g, np.int32))
        oh0 = np.zeros((n_bodies, len(g)), np.float32)
        oh1 = np.zeros((n_bodies, len(g)), np.float32)
        for k, r in enumerate(g):
            if b0[r] >= 0:
                oh0[b0[r], k] = 1.0
            if b1[r] >= 0:
                oh1[b1[r], k] = 1.0
        o0.append(jnp.asarray(oh0))
        o1.append(jnp.asarray(oh1))
    return tuple(gi), (tuple(o0), tuple(o1))


def _jacobi_schedule(b0, b1, n_bodies, phases):
    """Non-exact fast schedule: rows grouped by `phases` (list of index
    lists), impulses within a phase applied simultaneously (Jacobi).  Used
    for contact rows, which are sparse/rarely active on a hand — measured
    trajectory deviation vs the exact schedule is well inside the parity
    gate, for a 25x reduction in sequential depth."""
    gi, o0, o1 = [], [], []
    for g in phases:
        idx = np.asarray(g, np.int32)
        gi.append(idx)
        oh0 = np.zeros((n_bodies, len(g)), np.float32)
        oh1 = np.zeros((n_bodies, len(g)), np.float32)
        for k, r in enumerate(g):
            if b0[r] >= 0:
                oh0[b0[r], k] = 1.0
            if b1[r] >= 0:
                oh1[b1[r], k] = 1.0
        o0.append(jnp.asarray(oh0))
        o1.append(jnp.asarray(oh1))
    return tuple(gi), (tuple(o0), tuple(o1))


def build_hand_schedule(model, contacts_mode: str = "exact") -> HandSchedule:
    B = int(np.asarray(model.start_pose).shape[0])
    j0 = np.asarray(model.joint_rbi0)
    j1 = np.asarray(model.joint_rbi1)

    # nailed: 3 rows per joint, order = joint-major (physmodel.h:328-334)
    nl0 = np.repeat(j0, 3)
    nl1 = np.repeat(j1, 3)
    jl_groups, jl_onehots = _schedule(nl0, nl1, B)

    # angular ranges: 6 slots per joint (constraints.constrain_angular_range)
    na0 = np.repeat(j0, 6)
    na1 = np.repeat(j1, 6)
    ja_groups, ja_onehots = _schedule(na0, na1, B)

    # contacts: 3 rows (normal, fb, ft) per static pair
    pairs = np.asarray(model.collide_pairs)
    c0 = np.repeat(pairs[:, 0], 3)
    c1 = np.repeat(pairs[:, 1], 3)
    if contacts_mode == "jacobi":
        npair = len(pairs)
        phases = [list(range(0, 3 * npair, 3)),      # all normal rows
                  list(range(1, 3 * npair, 3)),      # all binormal friction
                  list(range(2, 3 * npair, 3))]      # all tangent friction
        ct_groups, ct_onehots = _jacobi_schedule(c0, c1, B, phases)
    else:
        ct_groups, ct_onehots = _schedule(c0, c1, B)

    # ApplyAngles: 3 drive rows (world,1) + 9 cone rows, pairs per
    # tracker.runtime.apply_angles emission order
    aa0 = [-1, -1, -1, 1]
    aa1 = [1, 1, 1, 4]
    for finger in (1, 2, 3, 4):
        aa0 += [1, 1]
        aa1 += [3 + finger * 3, 2 + finger * 3]
    ap_groups, ap_onehots = _schedule(np.asarray(aa0), np.asarray(aa1), B)

    # enhancement armdir cone: single (world, 0) row
    eh_groups, eh_onehots = _schedule(np.asarray([-1]), np.asarray([0]), B)

    return HandSchedule(jl_groups, jl_onehots, ja_groups, ja_onehots,
                        ct_groups, ct_onehots, ap_groups, ap_onehots,
                        eh_groups, eh_onehots)


def pair_linear(rows: LinearRows, groups, onehots) -> StaticPairLinear:
    return StaticPairLinear(rows, groups, onehots[0], onehots[1])


def pair_angular(rows: AngularRows, groups, onehots) -> StaticPairAngular:
    return StaticPairAngular(rows, groups, onehots[0], onehots[1])
