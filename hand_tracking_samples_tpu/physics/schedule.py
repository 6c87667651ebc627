"""Static row-schedule assembly for the colored solver.

Builds, once per model (host side), the precedence-preserving colorings and
padded one-hot application tensors for every statically-structured row class:
joint nailed rows, joint angular-range rows, contact rows, and the CNN
drive/cone rows.  Dynamic single-body rows (cloud, boundary, rays) are packed
per solve by physics/colored.pack_single_body_linear.

Each class schedule is a 4-tuple (gidx (G,W) i32, gmask (G,W) bool,
onehot0 (G,B,W), onehot1 (G,B,W)) consumed by one lax.fori_loop per class.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .colored import (StaticPairAngular, StaticPairLinear, pad_groups,
                      precedence_coloring)
from .solver import AngularRows, LinearRows


class HandSchedule(NamedTuple):
    """Host-computed static schedules, keyed by row class."""
    joint_lin: tuple      # 3*n_joints nailed rows
    joint_ang: tuple      # 6*n_joints angular-range rows
    contact: tuple        # 3*n_pairs contact rows
    apply_angles: tuple   # the 12 ApplyAngles rows
    enh_cone: tuple       # armdir cone (single row, world->0)


def _exact(b0, b1, n_bodies):
    groups = precedence_coloring(list(zip(b0, b1)))
    return pad_groups(groups, b0, b1, n_bodies)


def _jacobi(b0, b1, n_bodies, phases):
    """Non-exact fast schedule: rows grouped by `phases`, impulses within a
    phase applied simultaneously (Jacobi).  Used for contact rows, which are
    sparse/rarely active on a hand — measured trajectory deviation is well
    inside the parity gate, for a 25x reduction in sequential depth."""
    return pad_groups(phases, b0, b1, n_bodies)


def build_hand_schedule(model, contacts_mode: str = "exact") -> HandSchedule:
    B = int(np.asarray(model.start_pose).shape[0])
    j0 = np.asarray(model.joint_rbi0)
    j1 = np.asarray(model.joint_rbi1)

    # nailed: 3 rows per joint, order = joint-major (physmodel.h:328-334)
    joint_lin = _exact(np.repeat(j0, 3), np.repeat(j1, 3), B)
    # angular ranges: 6 slots per joint (constraints.constrain_angular_range)
    joint_ang = _exact(np.repeat(j0, 6), np.repeat(j1, 6), B)

    # contacts: CONTACT_POINTS x 3 rows (normal, fb, ft) per static pair
    from .contacts import CONTACT_POINTS
    U = 3 * CONTACT_POINTS
    pairs = np.asarray(model.collide_pairs)
    c0 = np.repeat(pairs[:, 0], U)
    c1 = np.repeat(pairs[:, 1], U)
    if contacts_mode == "jacobi":
        npair = len(pairs)
        phases = [list(range(r, U * npair, U)) for r in range(U)]
        contact = _jacobi(c0, c1, B, phases)
    else:
        contact = _exact(c0, c1, B)

    # ApplyAngles: 3 drive rows (world,1) + 9 cone rows, pairs per
    # tracker.runtime.apply_angles emission order
    aa0 = [-1, -1, -1, 1]
    aa1 = [1, 1, 1, 4]
    for finger in (1, 2, 3, 4):
        aa0 += [1, 1]
        aa1 += [3 + finger * 3, 2 + finger * 3]
    apply_angles = _exact(np.asarray(aa0), np.asarray(aa1), B)

    # enhancement armdir cone: single (world, 0) row
    enh_cone = _exact(np.asarray([-1]), np.asarray([0]), B)

    return HandSchedule(joint_lin, joint_ang, contact, apply_angles, enh_cone)


def pair_linear(rows: LinearRows, sched) -> StaticPairLinear:
    return StaticPairLinear(rows, *sched)


def pair_angular(rows: AngularRows, sched) -> StaticPairAngular:
    return StaticPairAngular(rows, *sched)
