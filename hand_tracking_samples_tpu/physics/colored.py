"""Colored-schedule Gauss-Seidel solver — the TPU fast path.

The reference solver sweeps rows strictly in order (physics.h:556-562).  Rows
whose body sets are disjoint commute, so the sweep can be reorganised into a
schedule of *groups* of mutually-disjoint rows, processed group-by-group in
an order that preserves the relative order of every conflicting row pair —
giving results identical to the sequential sweep while doing per-group work
as wide vector ops instead of per-row gathers/scatters.

Two row families:

  * Single-body rows (b0 = world, b1 dynamic): cloud constraints, boundary
    planes, CNN-ray rows.  Packed into a (C, B) slot matrix where slot (c, b)
    is the c-th row on body b; one fori step processes all B bodies
    elementwise — zero gathers, zero scatters.  Exact, because same-body rows
    keep their relative order (rank) and cross-body rows commute.
  * Static-pair rows (joints, contacts, drive/cone rows): (b0, b1) patterns
    are known at trace time, so a precedence-preserving greedy coloring is
    computed on the host; each group applies its impulses through constant
    one-hot matrices (a (B, W) matmul), so the scatter is constant-folded.

The sequential solver (solver.py) stays as the bit-faithful reference; this
module is validated against it.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .solver import (AngularRows, BodyParams, BodyState, FLT_MAX, LinearRows,
                     PhysicsParams, _world_iinv, rkupdateq)


# ---------------------------------------------------------------------------
# host-side precedence-preserving coloring
# ---------------------------------------------------------------------------

def precedence_coloring(body_sets: Sequence[tuple]) -> list[list[int]]:
    """Greedy schedule: row i goes to the earliest group after every earlier
    conflicting row's group.  Returns list of groups (lists of row indices);
    concatenated groups preserve all conflicting-pair orderings."""
    groups: list[list[int]] = []
    group_bodies: list[set] = []
    row_group = []
    for i, bodies in enumerate(body_sets):
        bs = {b for b in bodies if b >= 0}
        earliest = 0
        for j in range(i):
            if bs & {b for b in body_sets[j] if b >= 0}:
                earliest = max(earliest, row_group[j] + 1)
        g = earliest
        while g < len(groups) and (group_bodies[g] & bs):
            g += 1
        while g >= len(groups):
            groups.append([])
            group_bodies.append(set())
        groups[g].append(i)
        group_bodies[g] |= bs
        row_group.append(g)
    return groups


# ---------------------------------------------------------------------------
# block types
# ---------------------------------------------------------------------------

class SingleBodyLinear(NamedTuple):
    """(C, B)-slotted rows with b0 = world.  All fields (C, B, ...)."""
    normal: jnp.ndarray      # (C, B, 3)
    r1: jnp.ndarray          # (C, B, 3)
    targetdist: jnp.ndarray  # (C, B)
    targetspeednobias: jnp.ndarray
    fmin: jnp.ndarray
    fmax: jnp.ndarray
    active: jnp.ndarray      # (C, B) bool


class StaticPairLinear(NamedTuple):
    """Rows with static body pairs, plus a precomputed group schedule.

    The schedule is padded to uniform group width so a single lax.fori_loop
    processes all groups of the class (one fused loop body instead of one
    unrolled HLO block per group): gidx (G, W) row indices (pad -> 0 with
    gmask False), onehot0/1 (G, B, W) constant application matrices."""
    rows: LinearRows                  # (R,) SoA; b0/b1 static values
    gidx: jnp.ndarray                 # (G, W) int32
    gmask: jnp.ndarray                # (G, W) bool
    onehot0: jnp.ndarray              # (G, B, W)
    onehot1: jnp.ndarray              # (G, B, W)


class SingleBodyAngular(NamedTuple):
    axis: jnp.ndarray        # (C, B, 3)
    targetspin: jnp.ndarray  # (C, B)
    mintorque: jnp.ndarray
    maxtorque: jnp.ndarray
    active: jnp.ndarray


class StaticPairAngular(NamedTuple):
    rows: AngularRows
    gidx: jnp.ndarray
    gmask: jnp.ndarray
    onehot0: jnp.ndarray
    onehot1: jnp.ndarray


def pack_single_body_linear(rows: LinearRows, n_bodies: int,
                            slots: int) -> SingleBodyLinear:
    """Slot dynamic single-body rows by (rank within body, body).  Bodies
    with more rows than the per-body slot budget (config: cloud_rows_per_body)
    keep a UNIFORM subset — rank r maps to slot (r*slots)//count, first
    occurrence wins — rather than truncating the raster-order tail (the
    reference has no cap, physmodel.h:163-181; a tail drop cuts the bottom of
    the hand and biases the fit).  Same-body slot order stays monotone in row
    order, so the sequential sweep semantics are preserved."""
    b = jnp.maximum(rows.b1, 0)
    act = rows.active & (rows.b1 >= 0)
    onehot = (b[:, None] == jnp.arange(n_bodies)[None, :]) & act[:, None]
    rank = jnp.cumsum(onehot, axis=0) - 1          # (R, B)
    rank = jnp.sum(jnp.where(onehot, rank, 0), axis=1)
    cnt_b = jnp.sum(onehot, axis=0)                # (B,) rows per body
    cnt = jnp.sum(jnp.where(onehot, cnt_b[None, :], 0), axis=1)  # per row
    thin = cnt > slots
    safe = jnp.maximum(cnt, 1)
    nr = jnp.where(thin, (rank * slots) // safe, rank)
    prev = jnp.where(thin & (rank > 0), ((rank - 1) * slots) // safe, -1)
    keep = (~thin) | (rank == 0) | (nr > prev)
    ok = act & keep & (nr < slots)
    c = jnp.where(ok, nr, slots)    # overflow slot dropped via mode="drop"
    # thinned bodies keep their TOTAL force budget: each surviving row's
    # limits scale by count/slots, so a capped body pulls as hard against
    # the others as the reference's uncapped row set does in aggregate
    cntf = cnt.astype(jnp.float32)
    comp = jnp.where(thin, cntf * (1.0 / slots), 1.0)
    rows = rows._replace(fmin=rows.fmin * comp, fmax=rows.fmax * comp)

    # one scatter for all 11 row scalars (7 scatters of the same indices
    # would each pay the gather/scatter fixed costs)
    flat = jnp.concatenate([
        rows.normal, rows.r1,
        rows.targetdist[:, None], rows.targetspeednobias[:, None],
        rows.fmin[:, None], rows.fmax[:, None],
        (rows.active & ok).astype(jnp.float32)[:, None],
    ], axis=1)                                          # (R, 11)
    flat = jnp.where(ok[:, None], flat, 0.0)
    out = jnp.zeros((slots, n_bodies, 11), flat.dtype).at[c, b].set(
        flat, mode="drop", unique_indices=True)

    return SingleBodyLinear(
        normal=out[..., 0:3], r1=out[..., 3:6],
        targetdist=out[..., 6], targetspeednobias=out[..., 7],
        fmin=out[..., 8], fmax=out[..., 9],
        active=out[..., 10] > 0.5)


def pad_groups(groups, b0, b1, n_bodies):
    """Pad a group schedule to uniform width.  Returns (gidx (G,W) i32,
    gmask (G,W) bool, onehot0 (G,B,W), onehot1 (G,B,W)) as jnp constants."""
    G = len(groups)
    W = max(len(g) for g in groups) if groups else 1
    gidx = np.zeros((G, W), np.int32)
    gmask = np.zeros((G, W), bool)
    oh0 = np.zeros((G, n_bodies, W), np.float32)
    oh1 = np.zeros((G, n_bodies, W), np.float32)
    for gi, g in enumerate(groups):
        for k, r in enumerate(g):
            gidx[gi, k] = r
            gmask[gi, k] = True
            if b0[r] >= 0:
                oh0[gi, b0[r], k] = 1.0
            if b1[r] >= 0:
                oh1[gi, b1[r], k] = 1.0
    return (jnp.asarray(gidx), jnp.asarray(gmask), jnp.asarray(oh0),
            jnp.asarray(oh1))


def make_static_pair_linear(rows: LinearRows, b0: np.ndarray, b1: np.ndarray,
                            n_bodies: int) -> StaticPairLinear:
    """b0/b1 are the static host-side body indices of each row."""
    body_sets = [(int(a), int(c)) for a, c in zip(b0, b1)]
    groups = precedence_coloring(body_sets)
    return StaticPairLinear(rows, *pad_groups(groups, b0, b1, n_bodies))


def make_static_pair_angular(rows: AngularRows, b0, b1,
                             n_bodies: int) -> StaticPairAngular:
    lin = make_static_pair_linear(
        LinearRows.empty(0), np.asarray(b0), np.asarray(b1), n_bodies)
    return StaticPairAngular(rows, lin.gidx, lin.gmask, lin.onehot0,
                             lin.onehot1)


def pack_single_body_angular(rows: AngularRows, n_bodies: int,
                             slots: int) -> SingleBodyAngular:
    b = jnp.maximum(rows.b1, 0)
    act = rows.active & (rows.b1 >= 0)
    onehot = (b[:, None] == jnp.arange(n_bodies)[None, :]) & act[:, None]
    rank = jnp.cumsum(onehot, axis=0) - 1
    rank = jnp.sum(jnp.where(onehot, rank, 0), axis=1)
    ok = act & (rank < slots)
    c = jnp.where(ok, rank, slots)

    def scat(x, fill=0.0):
        shape = (slots, n_bodies) + x.shape[1:]
        out = jnp.full(shape, fill, x.dtype)
        return out.at[c, b].set(
            jnp.where(ok.reshape((-1,) + (1,) * (x.ndim - 1)), x, fill),
            mode="drop", unique_indices=True)

    return SingleBodyAngular(
        axis=scat(rows.axis), targetspin=scat(rows.targetspin),
        mintorque=scat(rows.mintorque, fill=-float(FLT_MAX)),
        maxtorque=scat(rows.maxtorque, fill=float(FLT_MAX)),
        active=scat(rows.active & ok, fill=False))


# ---------------------------------------------------------------------------
# the solve
# ---------------------------------------------------------------------------

def physics_update_colored(state: BodyState, bodies: BodyParams,
                           linear_blocks: Sequence, angular_blocks: Sequence,
                           params: PhysicsParams,
                           iterations: int = 16,
                           iterations_post: int = 4) -> BodyState:
    """Same semantics as physics_update for the given block schedule.
    linear_blocks / angular_blocks are processed in order each sweep."""
    dt = params.deltaT
    B = state.pose.shape[0]
    dampleftover = jnp.power(1.0 - jnp.maximum(bodies.damping, params.damping), dt)
    lin0 = state.linear_momentum * dampleftover[:, None]
    ang0 = state.angular_momentum * dampleftover[:, None]
    mass = 1.0 / bodies.massinv
    lin0 = lin0 + params.gravity * (mass * bodies.gravscale * dt)[:, None]
    q = state.orientation
    iinv = jax.vmap(_world_iinv)(q, bodies.tensorinv_massless, bodies.massinv)
    mi = bodies.massinv

    # ---- precompute per-block constants ----
    def prep_sb_lin(blk: SingleBodyLinear):
        J1 = jnp.cross(blk.r1, blk.normal)                       # (C,B,3)
        K1 = jnp.einsum("bij,cbj->cbi", iinv, J1)
        denom = mi[None, :] + jnp.einsum(
            "cbk,cbk->cb", jnp.cross(K1, blk.r1), blk.normal)
        dinv = jnp.where(blk.active & (denom != 0), 1.0 / denom, 0.0)
        ts0 = blk.targetdist / dt
        return (blk, J1, K1, dinv, ts0)

    def prep_sp_lin(blk: StaticPairLinear):
        r = blk.rows
        mi0 = jnp.where(r.b0 >= 0, mi[jnp.maximum(r.b0, 0)], 0.0)
        mi1 = jnp.where(r.b1 >= 0, mi[jnp.maximum(r.b1, 0)], 0.0)
        I0 = iinv[jnp.maximum(r.b0, 0)] * (r.b0 >= 0)[:, None, None]
        I1 = iinv[jnp.maximum(r.b1, 0)] * (r.b1 >= 0)[:, None, None]
        J0 = jnp.cross(r.r0, r.normal)
        J1 = jnp.cross(r.r1, r.normal)
        K0 = (I0 @ J0[..., None])[..., 0]
        K1 = (I1 @ J1[..., None])[..., 0]
        denom = (mi0 + jnp.einsum("rk,rk->r", jnp.cross(K0, r.r0), r.normal)
                 + mi1 + jnp.einsum("rk,rk->r", jnp.cross(K1, r.r1), r.normal))
        dinv = jnp.where(r.active & (denom != 0), 1.0 / denom, 0.0)
        ts0 = r.targetdist / dt
        return (blk, mi0, mi1, J0, J1, K0, K1, dinv, ts0)

    def prep_sb_ang(blk: SingleBodyAngular):
        K1 = jnp.einsum("bij,cbj->cbi", iinv, blk.axis)
        denom = jnp.einsum("cbk,cbk->cb", blk.axis, K1)
        stt = jnp.where(blk.active & (denom != 0), 1.0 / denom, 0.0)
        return (blk, K1, stt)

    def prep_sp_ang(blk: StaticPairAngular):
        r = blk.rows
        I0 = iinv[jnp.maximum(r.b0, 0)] * (r.b0 >= 0)[:, None, None]
        I1 = iinv[jnp.maximum(r.b1, 0)] * (r.b1 >= 0)[:, None, None]
        K0 = (I0 @ r.axis[..., None])[..., 0]
        K1 = (I1 @ r.axis[..., None])[..., 0]
        denom = (jnp.einsum("rk,rk->r", r.axis, K0)
                 + jnp.einsum("rk,rk->r", r.axis, K1))
        stt = jnp.where(r.active & (denom != 0), 1.0 / denom, 0.0)
        return (blk, K0, K1, stt)

    lin_prepped = []
    for blk in linear_blocks:
        if isinstance(blk, SingleBodyLinear):
            lin_prepped.append(("sb", prep_sb_lin(blk)))
        else:
            lin_prepped.append(("sp", prep_sp_lin(blk)))
    ang_prepped = []
    for blk in angular_blocks:
        if isinstance(blk, SingleBodyAngular):
            ang_prepped.append(("sb", prep_sb_ang(blk)))
        else:
            ang_prepped.append(("sp", prep_sp_ang(blk)))

    # ---- sweep machinery ----

    def sb_lin_sweep(pre, mom, isum, remove_bias):
        blk, J1, K1, dinv, ts0 = pre
        lin, ang = mom
        C = blk.normal.shape[0]
        ts = jnp.minimum(ts0, blk.targetspeednobias) if remove_bias else ts0

        # unroll UNROLL same-body rows per loop step: still exact sequential
        # per body, 4x fewer loop iterations (loop overhead dominates here)
        UNROLL = 4
        pad = (-C) % UNROLL

        def one_row(c, lin, ang, isum):
            n = blk.normal[c]                  # (B,3)
            vn = (jnp.einsum("bk,bk->b", lin, n) * mi
                  + jnp.einsum("bk,bk->b", ang, K1[c]))
            impulse = (-ts[c] - vn) * dinv[c]
            impulse = jnp.minimum(impulse, blk.fmax[c] * dt - isum[c])
            impulse = jnp.maximum(impulse, blk.fmin[c] * dt - isum[c])
            impulse = jnp.where(blk.active[c], impulse, 0.0)
            lin = lin + n * impulse[:, None]
            ang = ang + J1[c] * impulse[:, None]
            return lin, ang, isum.at[c].add(impulse)

        if pad == 0 and C >= UNROLL:
            def step(i, carry):
                lin, ang, isum = carry
                for u in range(UNROLL):
                    lin, ang, isum = one_row(i * UNROLL + u, lin, ang, isum)
                return lin, ang, isum
            lin, ang, isum = jax.lax.fori_loop(0, C // UNROLL, step,
                                               (lin, ang, isum))
        else:
            def step(c, carry):
                return one_row(c, *carry)
            lin, ang, isum = jax.lax.fori_loop(0, C, step, (lin, ang, isum))
        return (lin, ang), isum

    def sp_lin_sweep(pre, mom, isum, remove_bias):
        blk, mi0, mi1, J0, J1, K0, K1, dinv, ts0 = pre
        r = blk.rows
        lin, ang = mom
        ts = jnp.minimum(ts0, r.targetspeednobias) if remove_bias else ts0
        G = blk.gidx.shape[0]

        def group(g, carry):
            lin, ang, isum = carry
            i = blk.gidx[g]                          # (W,)
            O0, O1 = blk.onehot0[g], blk.onehot1[g]  # (B, W)
            w0 = (r.b0[i] >= 0)[:, None]
            w1 = (r.b1[i] >= 0)[:, None]
            b0 = jnp.maximum(r.b0[i], 0)
            b1 = jnp.maximum(r.b1[i], 0)
            n = r.normal[i]
            vn = (jnp.einsum("wk,wk->w", lin[b1] * w1, n) * mi1[i]
                  + jnp.einsum("wk,wk->w", ang[b1] * w1, K1[i])
                  - jnp.einsum("wk,wk->w", lin[b0] * w0, n) * mi0[i]
                  - jnp.einsum("wk,wk->w", ang[b0] * w0, K0[i]))
            impulse = (-ts[i] - vn) * dinv[i]
            master = isum[jnp.maximum(i + r.friction_master[i], 0)]
            f_hi = r.friction_coef[i] * master
            hi = jnp.where(r.friction_master[i] != 0, f_hi, r.fmax[i] * dt)
            lo = jnp.where(r.friction_master[i] != 0, -f_hi, r.fmin[i] * dt)
            impulse = jnp.minimum(impulse, hi - isum[i])
            impulse = jnp.maximum(impulse, lo - isum[i])
            impulse = jnp.where(r.active[i] & blk.gmask[g], impulse, 0.0)
            dl = n * impulse[:, None]
            lin = lin - O0 @ dl + O1 @ dl
            ang = ang - O0 @ (J0[i] * impulse[:, None]) \
                      + O1 @ (J1[i] * impulse[:, None])
            return lin, ang, isum.at[i].add(jnp.where(blk.gmask[g], impulse, 0.0))

        lin, ang, isum = jax.lax.fori_loop(0, G, group, (lin, ang, isum))
        return (lin, ang), isum

    def sb_ang_sweep(pre, mom, torq, remove_bias):
        blk, K1, stt = pre
        lin, ang = mom
        C = blk.axis.shape[0]
        if remove_bias:
            ts = jnp.where(blk.mintorque < 0, 0.0,
                           jnp.minimum(blk.targetspin, 0.0))
            ts = jnp.where(blk.targetspin == -FLT_MAX, blk.targetspin, ts)
        else:
            ts = blk.targetspin

        def step(c, carry):
            ang, torq = carry
            cur = jnp.einsum("bk,bk->b", ang, K1[c])
            dtq = (ts[c] - cur) * stt[c]
            dtq = jnp.minimum(dtq, blk.maxtorque[c] * dt - torq[c])
            dtq = jnp.maximum(dtq, blk.mintorque[c] * dt - torq[c])
            dtq = jnp.where(blk.active[c] & (ts[c] != -FLT_MAX), dtq, 0.0)
            ang = ang + blk.axis[c] * dtq[:, None]
            return ang, torq.at[c].add(dtq)

        ang, torq = jax.lax.fori_loop(0, C, step, (ang, torq))
        return (lin, ang), torq

    def sp_ang_sweep(pre, mom, torq, remove_bias):
        blk, K0, K1, stt = pre
        r = blk.rows
        lin, ang = mom
        if remove_bias:
            ts = jnp.where(r.mintorque < 0, 0.0, jnp.minimum(r.targetspin, 0.0))
            ts = jnp.where(r.targetspin == -FLT_MAX, r.targetspin, ts)
        else:
            ts = r.targetspin
        G = blk.gidx.shape[0]

        def group(g, carry):
            lin, ang, torq = carry
            i = blk.gidx[g]
            O0, O1 = blk.onehot0[g], blk.onehot1[g]
            b0 = jnp.maximum(r.b0[i], 0)
            b1 = jnp.maximum(r.b1[i], 0)
            cur = (jnp.einsum("wk,wk->w", ang[b1] * (r.b1[i] >= 0)[:, None], K1[i])
                   - jnp.einsum("wk,wk->w", ang[b0] * (r.b0[i] >= 0)[:, None], K0[i]))
            dtq = (ts[i] - cur) * stt[i]
            dtq = jnp.minimum(dtq, r.maxtorque[i] * dt - torq[i])
            dtq = jnp.maximum(dtq, r.mintorque[i] * dt - torq[i])
            dtq = jnp.where(r.active[i] & (ts[i] != -FLT_MAX) & blk.gmask[g],
                            dtq, 0.0)
            da = r.axis[i] * dtq[:, None]
            ang = ang - O0 @ da + O1 @ da
            return lin, ang, torq.at[i].add(jnp.where(blk.gmask[g], dtq, 0.0))

        lin, ang, torq = jax.lax.fori_loop(0, G, group, (lin, ang, torq))
        return (lin, ang), torq

    lin_sweeps = {"sb": sb_lin_sweep, "sp": sp_lin_sweep}
    ang_sweeps = {"sb": sb_ang_sweep, "sp": sp_ang_sweep}

    def zero_isum(pre, kind):
        if kind == "sb":
            return jnp.zeros_like(pre[0].targetdist)
        return jnp.zeros_like(pre[0].rows.targetdist)

    def zero_torq(pre, kind):
        if kind == "sb":
            return jnp.zeros_like(pre[0].targetspin)
        return jnp.zeros_like(pre[0].rows.targetspin)

    isums = [zero_isum(p, k) for k, p in lin_prepped]
    torqs = [zero_torq(p, k) for k, p in ang_prepped]

    def sweep(carry, remove_bias):
        mom, isums, torqs = carry
        isums = list(isums)
        torqs = list(torqs)
        for j, (kind, pre) in enumerate(lin_prepped):
            mom, isums[j] = lin_sweeps[kind](pre, mom, isums[j], remove_bias)
        for j, (kind, pre) in enumerate(ang_prepped):
            mom, torqs[j] = ang_sweeps[kind](pre, mom, torqs[j], remove_bias)
        return mom, tuple(isums), tuple(torqs)

    carry = ((lin0, ang0), tuple(isums), tuple(torqs))
    carry = jax.lax.fori_loop(0, iterations,
                              lambda _, c: sweep(c, False), carry)
    (lin, ang), isums, torqs = carry

    pos_next = state.position + lin * (mi * dt)[:, None]
    q_next = jax.vmap(rkupdateq, in_axes=(0, 0, 0, None))(
        q, bodies.tensorinv_massless * mi[:, None, None], ang, dt)

    carry = ((lin, ang), isums, torqs)
    carry = jax.lax.fori_loop(0, iterations_post,
                              lambda _, c: sweep(c, True), carry)
    (lin, ang), _, _ = carry

    return BodyState(pose=jnp.concatenate([pos_next, q_next], axis=-1),
                     linear_momentum=lin, angular_momentum=ang)
