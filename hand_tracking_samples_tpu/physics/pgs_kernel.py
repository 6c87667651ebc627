"""Pallas TPU kernel: the whole (16+4)-sweep PGS solve resident in VMEM.

Reference semantics: third_party/physics.h:543-587 (PhysicsUpdate).  This is
the batched fast path of the colored solver (physics/colored.py): identical
row maths, identical precedence-preserving schedule, but the entire sweep
loop runs inside ONE kernel with tracks on the 128-lane axis, so per-sweep
loop/dispatch overhead and HBM round-trips of the momenta vanish.

Layout (per 128-track block, all f32):
  * momenta: one (6*BP, T) value carried through the sweeps — rows k*BP+b =
    component k of body b; k in 0..2 linear, 3..5 angular.  BP = 24 (17
    bodies padded to a sublane multiple).
  * single-body rows (cloud/chamber/ray slots, b0 = world): (CS, 14*BP, T),
    channel-major per slot: n(3) J1(3) K1(3) dinv tsmain tspost fmin*dt
    fmax*dt.  Slot step = pure elementwise on (BP, T) planes: every body's
    slot-c row solves at once (exact: same-body rows keep their slot order,
    cross-body rows commute — see colored.py).
  * pair rows (joints/contacts/drives): units of U consecutive rows on one
    static body pair, precedence-colored into groups of W units.  Gathers
    and scatters of the two bodies' momenta are constant one-hot matmuls
    (12W x 6BP and 6BP x 9W) built on the host — the MXU does the scatter.
    Friction rows (contact units, physics.h:292) read the master row's
    accumulated impulse from the phase-major isum scratch at a static
    in-unit offset.
  * remove-bias sweeps select the precomputed ts_post channel
    (physics.h:570-573 semantics baked in during prep).

The public entry physics_update_pgs is a jax.custom_batching.custom_vmap:
unbatched (tests, CPU) it lowers to the exact colored solver; under vmap
(the tracks axis) it runs this kernel.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .solver import (AngularRows, BodyParams, BodyState, FLT_MAX, LinearRows,
                     PhysicsParams, _world_iinv, rkupdateq)
from .colored import precedence_coloring

BP = 24          # body slots (17 -> sublane multiple)
TBLK = 128       # tracks per kernel block (the lane axis)


def _tblk(plan) -> int:
    # Pallas TPU lane blocks must be 128-wide (or the whole array), so the
    # lane axis cannot shrink for large-CS plans; cloud_rows_per_body > 128
    # at T > 128 exceeds the VMEM singles window on the kernel path — use
    # solver="colored" there (tracker/config.py documents the envelope).
    return TBLK


def _round8(x: int) -> int:
    return max(8, -(-x // 8) * 8)


class PairClassPlan(NamedTuple):
    """Host-side static schedule for one pair-row class."""
    kind: str            # "lin" | "ang"
    U: int               # rows per unit (consecutive, same body pair)
    W: int               # padded units per group (multiple of 8)
    n_groups: int
    n_phases: int        # n_groups * U
    row_index: np.ndarray  # (n_phases * W,) int32 into the row SoA, -1 pad
    gather: np.ndarray     # lin (G, 12W, 6BP) | ang (G, 6W, 6BP)
    scatter: np.ndarray    # lin (G, 6BP, 9W) | ang (G, 6BP, 3W)
    friction: bool
    b0: np.ndarray         # (R,) static per-row body ids (prep gathers)
    b1: np.ndarray
    # row-group schedule in colored.py format for the unbatched fallback
    gidx: np.ndarray
    gmask: np.ndarray
    onehot0: np.ndarray
    onehot1: np.ndarray


class SolvePlan(NamedTuple):
    key: str
    CS: int
    lin_classes: tuple
    ang_classes: tuple
    massinv: np.ndarray   # (B,) host copy
    bp: int = BP          # body-slot padding: 24 for the 17-body hand, 8 for
    # the unibody plan (padding the single body to 24 cost 3x the VMEM and
    # pushed the 512-slot unibody window out of VMEM at point_budget=2048)


def build_pair_class(kind: str, unit_b0, unit_b1, U: int, massinv,
                     n_bodies: int, friction: bool = False,
                     mode: str = "exact") -> PairClassPlan:
    """Schedule a class of n_units*U rows (row i*U+u belongs to unit i).

    mode="exact": precedence coloring over units — concatenated phases are an
    exact reordering of the sequential sweep (conflicting units keep order).
    mode="jacobi": all units in one group (per-phase simultaneous impulse
    application; used for contacts where active rows are sparse).
    """
    unit_b0 = np.asarray(unit_b0, np.int32)
    unit_b1 = np.asarray(unit_b1, np.int32)
    n_units = len(unit_b0)
    if mode == "jacobi":
        groups = [list(range(n_units))]
    else:
        groups = precedence_coloring(list(zip(unit_b0, unit_b1)))
    G = len(groups)
    W = _round8(max(len(g) for g in groups))
    n_phases = G * U

    row_index = np.full((G, U, W), -1, np.int32)
    for g, us in enumerate(groups):
        for w, u in enumerate(us):
            for uu in range(U):
                row_index[g, uu, w] = u * U + uu

    nb6 = 6 * BP
    if kind == "lin":
        gather = np.zeros((G, 12 * W, nb6), np.float32)
        scatter = np.zeros((G, nb6, 9 * W), np.float32)
    else:
        gather = np.zeros((G, 6 * W, nb6), np.float32)
        scatter = np.zeros((G, nb6, 3 * W), np.float32)
    mi = np.asarray(massinv, np.float32)
    for g, us in enumerate(groups):
        for w, u in enumerate(us):
            b0, b1 = int(unit_b0[u]), int(unit_b1[u])
            for k in range(3):
                if kind == "lin":
                    if b0 >= 0:
                        gather[g, k * W + w, k * BP + b0] = mi[b0]
                        gather[g, 3 * W + k * W + w, (3 + k) * BP + b0] = 1.0
                        scatter[g, k * BP + b0, k * W + w] = -1.0
                        scatter[g, (3 + k) * BP + b0, 3 * W + k * W + w] = -1.0
                    if b1 >= 0:
                        gather[g, 6 * W + k * W + w, k * BP + b1] = mi[b1]
                        gather[g, 9 * W + k * W + w, (3 + k) * BP + b1] = 1.0
                        scatter[g, k * BP + b1, k * W + w] = 1.0
                        scatter[g, (3 + k) * BP + b1, 6 * W + k * W + w] = 1.0
                else:
                    if b0 >= 0:
                        gather[g, k * W + w, (3 + k) * BP + b0] = 1.0
                        scatter[g, (3 + k) * BP + b0, k * W + w] = -1.0
                    if b1 >= 0:
                        gather[g, 3 * W + k * W + w, (3 + k) * BP + b1] = 1.0
                        scatter[g, (3 + k) * BP + b1, k * W + w] = 1.0

    # colored-format row schedule (for the unbatched fallback): the same
    # group order, rows of phase (g, u) = units of group g at in-unit row u
    row_groups = [[u * U + uu for u in us]
                  for g, us in enumerate(groups) for uu in range(U)]
    b0r = np.repeat(unit_b0, U)
    b1r = np.repeat(unit_b1, U)
    RG = len(row_groups)
    RW = max(len(g) for g in row_groups)
    gidx = np.zeros((RG, RW), np.int32)
    gmask = np.zeros((RG, RW), bool)
    oh0 = np.zeros((RG, n_bodies, RW), np.float32)
    oh1 = np.zeros((RG, n_bodies, RW), np.float32)
    for gi, grp in enumerate(row_groups):
        for k, r in enumerate(grp):
            gidx[gi, k] = r
            gmask[gi, k] = True
            if b0r[r] >= 0:
                oh0[gi, b0r[r], k] = 1.0
            if b1r[r] >= 0:
                oh1[gi, b1r[r], k] = 1.0
    return PairClassPlan(
        kind=kind, U=U, W=W, n_groups=G, n_phases=n_phases,
        row_index=row_index.reshape(-1), gather=gather, scatter=scatter,
        friction=friction, b0=b0r, b1=b1r,
        gidx=gidx, gmask=gmask, onehot0=oh0, onehot1=oh1)


# ---------------------------------------------------------------------------
# kernel generation
# ---------------------------------------------------------------------------

def _make_kernel(plan: SolvePlan, iterations: int, iterations_post: int):
    CS = plan.CS
    lin_classes = plan.lin_classes
    ang_classes = plan.ang_classes
    BP = plan.bp            # shadows the module default (plan-specific pad)

    def kernel(*refs):
        it = iter(refs)
        mom0_ref = next(it)
        mi_ref = next(it)
        s_ref = next(it) if CS else None
        lin_refs = [(next(it), next(it), next(it)) for _ in lin_classes]
        ang_refs = [(next(it), next(it), next(it)) for _ in ang_classes]
        out_ref = next(it)
        isum_s_ref = next(it) if CS else None
        lin_isum = [next(it) for _ in lin_classes]
        ang_torq = [next(it) for _ in ang_classes]
        gact_refs = [next(it) if cls.friction else None
                     for cls in lin_classes]

        mi = mi_ref[:]                                  # (BP, T)
        sact_ref = None
        if CS:
            isum_s_ref[:] = jnp.zeros(isum_s_ref.shape, isum_s_ref.dtype)
            sact_ref = refs[-1]
        for r in lin_isum + ang_torq:
            r[:] = jnp.zeros(r.shape, r.dtype)

        if CS:
            # dynamic slot-loop bound: a slot whose dinv plane is all-zero
            # across the block is an EXACT no-op (imp = 0 clamped into
            # [fmin, fmax] with fmin <= 0 <= fmax always), and the packed
            # cloud block fills slots 0..count-1 per body, so activity is a
            # PREFIX of the slot range — the 20-sweep loop runs to the last
            # active slot instead of CS.  In the MultiStepSim solves the
            # subsample fills ~10-30 of the 128 per-body slots, so most

            # slot steps vanish.  Computed once (poses are constant during
            # a solve; a per-slot lax.cond was measured SLOWER — it breaks
            # the fori pipeline).
            nact = jnp.int32(0)
            for c in range(CS):
                act_c = jnp.sum(jnp.abs(s_ref[c, 9 * BP:10 * BP])) > 0
                nact = jnp.where(act_c, jnp.int32(c + 1), nact)
            sact_ref[0] = nact

        # per-group activity for contact classes (rows inactive -> dinv 0):
        # most collide pairs never touch, so whole precedence groups skip
        # their gather + 12-row solve + scatter every sweep.  Computed ONCE
        # (activity is static across a solve: poses are constant during it),
        # stored in SMEM for dynamic indexing from the group fori.
        for cls, refs3, gref in zip(lin_classes, lin_refs, gact_refs):
            if gref is None:
                continue
            rows_ref = refs3[0]
            W = cls.W
            for g in range(cls.n_groups):
                act = jnp.zeros((), jnp.float32)
                for u in range(cls.U):
                    blk = rows_ref[g * cls.U + u]
                    act = act + jnp.sum(jnp.abs(blk[15 * W:16 * W]))
                gref[g] = (act > 0).astype(jnp.int32)

        def single_slot(c, mom, post):
            blk = s_ref[c]                              # (14BP, T)
            lin = mom[0:3 * BP]
            ang = mom[3 * BP:6 * BP]
            n = blk[0:3 * BP]
            J = blk[3 * BP:6 * BP]
            K = blk[6 * BP:9 * BP]
            dinv = blk[9 * BP:10 * BP]
            o = 11 if post else 10
            ts = blk[o * BP:(o + 1) * BP]
            fmin = blk[12 * BP:13 * BP]
            fmax = blk[13 * BP:14 * BP]
            ln = lin * n
            ak = ang * K
            vn = ((ln[0:BP] + ln[BP:2 * BP] + ln[2 * BP:3 * BP]) * mi
                  + ak[0:BP] + ak[BP:2 * BP] + ak[2 * BP:3 * BP])
            imp = (-ts - vn) * dinv
            isc = isum_s_ref[pl.ds(c * BP, BP)]
            imp = jnp.minimum(imp, fmax - isc)
            imp = jnp.maximum(imp, fmin - isc)
            isum_s_ref[pl.ds(c * BP, BP)] = isc + imp
            imp3 = jnp.concatenate([imp, imp, imp], axis=0)
            return jnp.concatenate([lin + n * imp3, ang + J * imp3], axis=0)

        def lin_group(cls, refs, isum_ref, g, mom, post):
            """All U rows of every unit in group g: ONE gather + ONE scatter.

            The U rows of a unit share one static body pair, so their scatter
            columns are identical and the sequential Gauss-Seidel sweep over
            them can run in-register: each row updates the gathered local
            velocities (l0m, a0, l1m, a1) directly instead of re-gathering
            after an MXU scatter (physics.h:556-562 row order preserved)."""
            rows_ref, G_ref, S_ref = refs
            U, W = cls.U, cls.W
            gath = jnp.dot(G_ref[g], mom,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (12W, T)
            l0m = gath[0:3 * W]
            a0 = gath[3 * W:6 * W]
            l1m = gath[6 * W:9 * W]
            a1 = gath[9 * W:12 * W]
            sv = None
            for u in range(U):
                p = g * U + u
                blk = rows_ref[p]                       # (23W, T)
                n = blk[0:3 * W]
                J0 = blk[3 * W:6 * W]
                J1 = blk[6 * W:9 * W]
                K0 = blk[9 * W:12 * W]
                K1 = blk[12 * W:15 * W]
                dinv = blk[15 * W:16 * W]
                o = 17 if post else 16
                ts = blk[o * W:(o + 1) * W]
                fminD = blk[18 * W:19 * W]
                fmaxD = blk[19 * W:20 * W]
                fcoef = blk[20 * W:21 * W]
                mi0 = blk[21 * W:22 * W]
                mi1 = blk[22 * W:23 * W]
                vn3 = (l1m - l0m) * n + a1 * K1 - a0 * K0
                vn = vn3[0:W] + vn3[W:2 * W] + vn3[2 * W:3 * W]
                imp = (-ts - vn) * dinv
                isc = isum_ref[pl.ds(p * W, W)]
                if cls.friction and u % 3 != 0:
                    # master = the contact's normal row (rows are [n, fb, ft]
                    # per contact point; physics.h:292) — its isum was updated
                    # earlier in this unrolled unit loop
                    mst = isum_ref[pl.ds((g * U + (u // 3) * 3) * W, W)]
                else:
                    mst = isc
                hi = fmaxD + fcoef * mst
                lo = fminD - fcoef * mst
                imp = jnp.minimum(imp, hi - isc)
                imp = jnp.maximum(imp, lo - isc)
                isum_ref[pl.ds(p * W, W)] = isc + imp
                imp3 = jnp.concatenate([imp, imp, imp], axis=0)
                dl = n * imp3
                da0 = J0 * imp3
                da1 = J1 * imp3
                svu = jnp.concatenate([dl, da0, da1], axis=0)
                sv = svu if sv is None else sv + svu
                if u + 1 < U:
                    mi0_3 = jnp.concatenate([mi0, mi0, mi0], axis=0)
                    mi1_3 = jnp.concatenate([mi1, mi1, mi1], axis=0)
                    l0m = l0m - mi0_3 * dl
                    l1m = l1m + mi1_3 * dl
                    a0 = a0 - da0
                    a1 = a1 + da1
            return mom + jnp.dot(S_ref[g], sv,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)

        def ang_group(cls, refs, torq_ref, g, mom, post):
            rows_ref, G_ref, S_ref = refs
            U, W = cls.U, cls.W
            gath = jnp.dot(G_ref[g], mom,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (6W, T)
            a0 = gath[0:3 * W]
            a1 = gath[3 * W:6 * W]
            sv = None
            for u in range(U):
                p = g * U + u
                blk = rows_ref[p]                       # (14W, T)
                axis = blk[0:3 * W]
                K0 = blk[3 * W:6 * W]
                K1 = blk[6 * W:9 * W]
                stt = blk[9 * W:10 * W]
                o = 11 if post else 10
                ts = blk[o * W:(o + 1) * W]
                mintD = blk[12 * W:13 * W]
                maxtD = blk[13 * W:14 * W]
                cur3 = a1 * K1 - a0 * K0
                cur = cur3[0:W] + cur3[W:2 * W] + cur3[2 * W:3 * W]
                dtq = (ts - cur) * stt
                tq = torq_ref[pl.ds(p * W, W)]
                dtq = jnp.minimum(dtq, maxtD - tq)
                dtq = jnp.maximum(dtq, mintD - tq)
                torq_ref[pl.ds(p * W, W)] = tq + dtq
                da = axis * jnp.concatenate([dtq, dtq, dtq], axis=0)
                sv = da if sv is None else sv + da
                if u + 1 < U:
                    a0 = a0 - da
                    a1 = a1 + da
            return mom + jnp.dot(S_ref[g], sv,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)

        unroll_cs = int(os.environ.get("HTS_PGS_UNROLL_CS", "1"))
        unroll_g = int(os.environ.get("HTS_PGS_UNROLL_G", "1"))

        def chunked(n, step, mom, k):
            """fori over n steps with k statically-unrolled steps per
            iteration (Mosaic's fori_loop only full-unrolls) + remainder."""
            k = max(1, min(k, n))
            if k >= n:                      # fully static: no fori at all
                for c in range(n):
                    mom = step(c, mom)
                return mom

            def body(i, m):
                for j in range(k):
                    m = step(i * k + j, m)
                return m

            mom = jax.lax.fori_loop(0, n // k, body, mom)
            for c in range(n - n % k, n):   # static remainder indices
                mom = step(c, mom)
            return mom

        def make_sweep(post):
            def body(_, mom):
                if CS:
                    mom = jax.lax.fori_loop(
                        0, sact_ref[0],
                        lambda c, m: single_slot(c, m, post), mom)
                for cls, refs, isr, gref in zip(lin_classes, lin_refs,
                                                lin_isum, gact_refs):
                    step = functools.partial(lin_group, cls, refs, isr,
                                             post=post)
                    if gref is not None:
                        base = step
                        step = (lambda bs: lambda g, m: jax.lax.cond(
                            gref[g] > 0, lambda mm: bs(g, mm),
                            lambda mm: mm, m))(base)
                    mom = chunked(cls.n_groups, step, mom, unroll_g)
                for cls, refs, tqr in zip(ang_classes, ang_refs, ang_torq):
                    mom = chunked(
                        cls.n_groups,
                        functools.partial(ang_group, cls, refs, tqr,
                                          post=post),
                        mom, unroll_g)
                return mom
            return body

        mom = mom0_ref[:]
        mom = jax.lax.fori_loop(0, iterations, make_sweep(False), mom)
        out_ref[0] = mom
        mom = jax.lax.fori_loop(0, iterations_post, make_sweep(True), mom)
        out_ref[1] = mom

    return kernel


def _pallas_solve(plan: SolvePlan, iterations: int, iterations_post: int,
                  mom0, mi, s_all, lin_rows, lin_G, lin_S, ang_rows, ang_G,
                  ang_S, interpret: bool):
    """mom0 (6BP, T), mi (BP, T), s_all (CS, 14BP, T), per-class row stacks.
    T must be a multiple of TBLK.  Returns (2, 6BP, T)."""
    BP = plan.bp
    T = mom0.shape[-1]
    tblk = _tblk(plan)
    grid = (T // tblk,)
    kernel = _make_kernel(plan, iterations, iterations_post)

    def tspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape[:-1] + (tblk,),
                            (lambda i: (0, i)) if nd == 2 else
                            (lambda i: (0, 0, i)),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [tspec(mom0.shape), tspec(mi.shape)]
    inputs = [mom0, mi]
    if plan.CS:
        in_specs.append(tspec(s_all.shape))
        inputs.append(s_all)
    for cls, rows, G, S in zip(plan.lin_classes, lin_rows, lin_G, lin_S):
        in_specs += [tspec(rows.shape), cspec(G.shape), cspec(S.shape)]
        inputs += [rows, G, S]
    for cls, rows, G, S in zip(plan.ang_classes, ang_rows, ang_G, ang_S):
        in_specs += [tspec(rows.shape), cspec(G.shape), cspec(S.shape)]
        inputs += [rows, G, S]

    scratch = []
    if plan.CS:
        scratch.append(pltpu.VMEM((plan.CS * BP, tblk), jnp.float32))
    for cls in plan.lin_classes:
        scratch.append(pltpu.VMEM((cls.n_phases * cls.W, tblk), jnp.float32))
    for cls in plan.ang_classes:
        scratch.append(pltpu.VMEM((cls.n_phases * cls.W, tblk), jnp.float32))
    for cls in plan.lin_classes:
        if cls.friction:
            scratch.append(pltpu.SMEM((cls.n_groups,), jnp.int32))
    if plan.CS:
        # the dynamic slot-loop bound (last active slot + 1)
        scratch.append(pltpu.SMEM((1,), jnp.int32))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, 6 * BP, tblk), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 6 * BP, T), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            # track blocks are independent: parallel semantics double-buffers
            # the grid-step DMA (the default serializes DMA against compute).
            # NOTE the VMEM envelope: cap 256 plans (singles window 45
            # MB/block) exceed VMEM once T > 128 makes the grid > 1 and
            # windows double-buffer (Mosaic buffers windowed inputs under
            # either semantics — measured r5); at T <= 128 the grid is 1,
            # nothing is windowed, and cap 256 fits.  docs/PERFORMANCE.md
            # round-5 records the recorded-data accuracy ablation.
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*inputs)


# ---------------------------------------------------------------------------
# XLA-side prep (batched over tracks, T-leading)
# ---------------------------------------------------------------------------

def _pad_tracks(x, Tp):
    """Pad the LAST axis (tracks) to Tp with zeros."""
    T = x.shape[-1]
    if T == Tp:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, Tp - T)]
    return jnp.pad(x, pad)


def _to_planes(channels, Tp, bp: int = BP):
    """channels: list of (T, C, B) arrays -> (C, nch*bp, Tp)."""
    x = jnp.stack(channels, axis=2)                     # (T, C, nch, B)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, bp - x.shape[-1])))
    x = x.transpose(1, 2, 3, 0)                         # (C, nch, BP, T)
    x = x.reshape(x.shape[0], -1, x.shape[-1])
    return _pad_tracks(x, Tp)


def _batched_world_iinv(q, tinv, massinv):
    """_world_iinv (physics.h:518) batched elementwise: the vmapped
    R @ tinv @ R^T lowers to K=3 MXU passes at HIGHEST precision.  Same qrot
    column construction, products expanded as FMAs."""
    from ..maths.quat import qrot
    eye = jnp.eye(3, dtype=q.dtype)
    R = jnp.stack([qrot(q, eye[i]) for i in range(3)], axis=-1)  # (T,B,3,3)
    A = jnp.stack([jnp.stack(
        [sum(R[..., i, k] * tinv[..., k, j] for k in range(3))
         for j in range(3)], axis=-1) for i in range(3)], axis=-2)
    W = jnp.stack([jnp.stack(
        [sum(A[..., i, k] * R[..., j, k] for k in range(3))
         for j in range(3)], axis=-1) for i in range(3)], axis=-2)
    return W * massinv[..., None, None]


def _mv33(M, v):
    """(..., 3, 3) @ (..., 3) as elementwise FMAs: a K=3 dot_general at
    HIGHEST precision costs a full 128-deep MXU pass per output element."""
    return jnp.stack(
        [M[..., i, 0] * v[..., 0] + M[..., i, 1] * v[..., 1]
         + M[..., i, 2] * v[..., 2] for i in range(3)], axis=-1)


def _prep_singles(sb, iinv, massinv, dt, Tp, bp: int = BP):
    """sb: SingleBodyLinear with (T, C, B, ...) leaves -> (CS, 14*bp, Tp)."""
    act = sb.active.astype(jnp.float32)
    n = sb.normal * act[..., None]
    r1 = sb.r1
    J1 = jnp.cross(r1, n)
    K1 = _mv33(iinv[:, None], J1)
    denom = massinv[None, None, :] + jnp.einsum(
        "tcbk,tcbk->tcb", jnp.cross(K1, r1), n)
    dinv = jnp.where(sb.active & (denom != 0), 1.0 / denom, 0.0)
    tsm = sb.targetdist / dt * act
    tsp = jnp.minimum(tsm, sb.targetspeednobias * act)
    chans = [n[..., 0], n[..., 1], n[..., 2],
             J1[..., 0], J1[..., 1], J1[..., 2],
             K1[..., 0], K1[..., 1], K1[..., 2],
             dinv, tsm, tsp, sb.fmin * dt * act, sb.fmax * dt * act]
    return _to_planes(chans, Tp, bp)


def _gather_rows(x, ridx):
    """x (T, R, ...) -> (T, P, W, ...) by static row indices (-1 -> zeros)."""
    safe = np.maximum(ridx, 0)
    out = x[:, safe]
    mask = (ridx >= 0).astype(x.dtype).reshape(
        (1,) + ridx.shape + (1,) * (x.ndim - 2))
    return out * mask


def _phase_planes(channels, cls, Tp):
    """channels: list of (T, R) arrays -> (n_phases, nch*W, Tp)."""
    T = channels[0].shape[0]
    ridx = cls.row_index.reshape(cls.n_phases, cls.W)
    x = jnp.stack(channels, axis=2)                     # (T, R, nch)
    g = _gather_rows(x, ridx.reshape(-1))               # (T, P*W, nch)
    g = g.reshape(T, cls.n_phases, cls.W, len(channels))
    g = g.transpose(1, 3, 2, 0)                         # (P, nch, W, T)
    g = g.reshape(cls.n_phases, -1, T)
    return _pad_tracks(g, Tp)


def _prep_lin_class(rows: LinearRows, cls: PairClassPlan, iinv, massinv, dt,
                    Tp):
    b0, b1 = cls.b0, cls.b1
    mi0 = jnp.asarray(np.where(b0 >= 0, np.asarray(massinv)[np.maximum(b0, 0)],
                               0.0), jnp.float32)
    mi1 = jnp.asarray(np.where(b1 >= 0, np.asarray(massinv)[np.maximum(b1, 0)],
                               0.0), jnp.float32)
    I0 = iinv[:, np.maximum(b0, 0)] * (b0 >= 0)[None, :, None, None]
    I1 = iinv[:, np.maximum(b1, 0)] * (b1 >= 0)[None, :, None, None]
    act = rows.active.astype(jnp.float32)
    n = rows.normal * act[..., None]
    J0 = jnp.cross(rows.r0, n)
    J1 = jnp.cross(rows.r1, n)
    K0 = _mv33(I0, J0)
    K1 = _mv33(I1, J1)
    denom = (mi0[None] + jnp.einsum("trk,trk->tr", jnp.cross(K0, rows.r0), n)
             + mi1[None] + jnp.einsum("trk,trk->tr", jnp.cross(K1, rows.r1), n))
    dinv = jnp.where(rows.active & (denom != 0), 1.0 / denom, 0.0)
    tsm = rows.targetdist / dt * act
    tsp = jnp.minimum(tsm, rows.targetspeednobias * act)
    T = act.shape[0]
    chans = [n[..., 0], n[..., 1], n[..., 2],
             J0[..., 0], J0[..., 1], J0[..., 2],
             J1[..., 0], J1[..., 1], J1[..., 2],
             K0[..., 0], K0[..., 1], K0[..., 2],
             K1[..., 0], K1[..., 1], K1[..., 2],
             dinv, tsm, tsp, rows.fmin * dt * act, rows.fmax * dt * act,
             rows.friction_coef * act,
             jnp.broadcast_to(mi0[None], (T, mi0.shape[0])),
             jnp.broadcast_to(mi1[None], (T, mi1.shape[0]))]
    return _phase_planes(chans, cls, Tp)


def _prep_ang_class(rows: AngularRows, cls: PairClassPlan, iinv, dt, Tp):
    b0, b1 = cls.b0, cls.b1
    I0 = iinv[:, np.maximum(b0, 0)] * (b0 >= 0)[None, :, None, None]
    I1 = iinv[:, np.maximum(b1, 0)] * (b1 >= 0)[None, :, None, None]
    K0 = _mv33(I0, rows.axis)
    K1 = _mv33(I1, rows.axis)
    denom = (jnp.einsum("trk,trk->tr", rows.axis, K0)
             + jnp.einsum("trk,trk->tr", rows.axis, K1))
    skip = rows.targetspin == -FLT_MAX
    stt = jnp.where(rows.active & ~skip & (denom != 0), 1.0 / denom, 0.0)
    act = (rows.active & ~skip).astype(jnp.float32)
    tsm = rows.targetspin * act
    tsp = jnp.where(rows.mintorque < 0, 0.0,
                    jnp.minimum(rows.targetspin, 0.0)) * act
    mintD = jnp.maximum(rows.mintorque * dt, -FLT_MAX)
    maxtD = jnp.minimum(rows.maxtorque * dt, FLT_MAX)
    chans = [rows.axis[..., 0] * act, rows.axis[..., 1] * act,
             rows.axis[..., 2] * act,
             K0[..., 0], K0[..., 1], K0[..., 2],
             K1[..., 0], K1[..., 1], K1[..., 2],
             stt, tsm, tsp, mintD * act, maxtD * act + (1.0 - act)]
    return _phase_planes(chans, cls, Tp)


# ---------------------------------------------------------------------------
# the custom_vmap entry point
# ---------------------------------------------------------------------------

_PLANS: dict = {}
_SOLVERS: dict = {}


def register_plan(plan: SolvePlan):
    _PLANS[plan.key] = plan
    return plan


def _interpret() -> bool:
    if os.environ.get("HTS_KERNEL_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


def _get_solver(plan_key: str, iterations: int, iterations_post: int):
    skey = (plan_key, iterations, iterations_post)
    if skey in _SOLVERS:
        return _SOLVERS[skey]
    plan = _PLANS[plan_key]

    from jax.custom_batching import custom_vmap

    @custom_vmap
    def solve(state, bodies, single_rows, lin_rows, ang_rows, params):
        # unbatched: exact colored solve over the same schedule
        from .colored import (SingleBodyLinear, StaticPairAngular,
                              StaticPairLinear, physics_update_colored)
        lin_blocks = []
        if plan.CS:
            lin_blocks.append(single_rows)
        for cls, rows in zip(plan.lin_classes, lin_rows):
            rows = rows._replace(b0=jnp.asarray(cls.b0),
                                 b1=jnp.asarray(cls.b1))
            lin_blocks.append(StaticPairLinear(
                rows, jnp.asarray(cls.gidx), jnp.asarray(cls.gmask),
                jnp.asarray(cls.onehot0), jnp.asarray(cls.onehot1)))
        ang_blocks = []
        for cls, rows in zip(plan.ang_classes, ang_rows):
            rows = rows._replace(b0=jnp.asarray(cls.b0),
                                 b1=jnp.asarray(cls.b1))
            ang_blocks.append(StaticPairAngular(
                rows, jnp.asarray(cls.gidx), jnp.asarray(cls.gmask),
                jnp.asarray(cls.onehot0), jnp.asarray(cls.onehot1)))
        return physics_update_colored(state, bodies, lin_blocks, ang_blocks,
                                      params, iterations=iterations,
                                      iterations_post=iterations_post)

    @solve.def_vmap
    def solve_vmap(axis_size, in_batched, state, bodies, single_rows,
                   lin_rows, ang_rows, params):
        T = axis_size

        def bc(tree, tb):
            return jax.tree.map(
                lambda x, b: x if b else
                jnp.broadcast_to(jnp.asarray(x), (T,) + jnp.shape(x)),
                tree, tb)

        (sb_state, sb_bodies, sb_single, sb_lin, sb_ang, sb_params) = (
            in_batched)
        state = bc(state, sb_state)
        single_rows = bc(single_rows, sb_single) if plan.CS else single_rows
        lin_rows = bc(lin_rows, sb_lin)
        ang_rows = bc(ang_rows, sb_ang)
        # bodies/params are per-model constants (never batched)
        bodies_u = jax.tree.map(
            lambda x, b: x[0] if b else x, bodies, sb_bodies)
        params_u = jax.tree.map(
            lambda x, b: x[0] if b else x, params, sb_params)

        out = _solve_batched(plan, iterations, iterations_post, state,
                             bodies_u, single_rows, lin_rows, ang_rows,
                             params_u)
        return out, jax.tree.map(lambda _: True, out)

    _SOLVERS[skey] = solve
    return solve


def _solve_batched(plan, iterations, iterations_post, state, bodies,
                   single_rows, lin_rows, ang_rows, params):
    """state leaves (T, B, ...); row leaves (T, ...). Returns BodyState."""
    dt = params.deltaT
    T, B = state.pose.shape[0], state.pose.shape[1]
    Tp = -(-T // _tblk(plan)) * _tblk(plan)

    dampleftover = jnp.power(
        1.0 - jnp.maximum(bodies.damping, params.damping), dt)
    lin0 = state.linear_momentum * dampleftover[None, :, None]
    ang0 = state.angular_momentum * dampleftover[None, :, None]
    mass = 1.0 / bodies.massinv
    lin0 = lin0 + params.gravity[None, None, :] * (
        mass * bodies.gravscale * dt)[None, :, None]
    q = state.pose[..., 3:7]
    iinv = _batched_world_iinv(q, bodies.tensorinv_massless,
                               bodies.massinv)          # (T, B, 3, 3)

    bp = plan.bp

    def mom_planes(linm, angm):
        x = jnp.concatenate([linm, angm], axis=-1)      # (T, B, 6)
        x = jnp.pad(x, ((0, 0), (0, bp - B), (0, 0)))
        x = x.transpose(2, 1, 0)                        # (6, bp, T)
        return _pad_tracks(x.reshape(6 * bp, T), Tp)

    mom0 = mom_planes(lin0, ang0)
    mi = _pad_tracks(jnp.broadcast_to(
        jnp.pad(bodies.massinv, (0, bp - B))[:, None], (bp, T)), Tp)

    s_all = (_prep_singles(single_rows, iinv, bodies.massinv, dt, Tp, bp)
             if plan.CS else None)
    lin_planes = [_prep_lin_class(r, c, iinv, bodies.massinv, dt, Tp)
                  for r, c in zip(lin_rows, plan.lin_classes)]
    ang_planes = [_prep_ang_class(r, c, iinv, dt, Tp)
                  for r, c in zip(ang_rows, plan.ang_classes)]
    if os.environ.get("HTS_ZERO_PLANES"):
        # perf-experiment ONLY: zero the packed pair-row planes with a cheap
        # pose-dependent scalar so XLA drops factories AND prep
        z = state.pose[0, 0, 0] * 0.0
        lin_planes = [jnp.broadcast_to(z, x.shape) for x in lin_planes]
        ang_planes = [jnp.broadcast_to(z, x.shape) for x in ang_planes]
    lin_G = [jnp.asarray(c.gather) for c in plan.lin_classes]
    lin_S = [jnp.asarray(c.scatter) for c in plan.lin_classes]
    ang_G = [jnp.asarray(c.gather) for c in plan.ang_classes]
    ang_S = [jnp.asarray(c.scatter) for c in plan.ang_classes]

    out = _pallas_solve(plan, iterations, iterations_post, mom0, mi, s_all,
                        lin_planes, lin_G, lin_S, ang_planes, ang_G, ang_S,
                        interpret=_interpret())            # (2, 6BP, Tp)

    def unplanes(x):
        x = x.reshape(6, bp, Tp)[:, :B, :T]             # (6, B, T)
        x = x.transpose(2, 1, 0)                        # (T, B, 6)
        return x[..., 0:3], x[..., 3:6]

    lin_m, ang_m = unplanes(out[0])
    lin_f, ang_f = unplanes(out[1])

    pos_next = state.pose[..., :3] + lin_m * (bodies.massinv * dt)[None, :, None]
    q_next = jax.vmap(jax.vmap(rkupdateq, in_axes=(0, 0, 0, None)),
                      in_axes=(0, None, 0, None))(
        q, bodies.tensorinv_massless * bodies.massinv[:, None, None],
        ang_m, dt)
    return BodyState(pose=jnp.concatenate([pos_next, q_next], axis=-1),
                     linear_momentum=lin_f, angular_momentum=ang_f)


def _model_digest(model) -> str:
    import hashlib
    h = hashlib.sha1()
    h.update(np.asarray(model.massinv).tobytes())
    h.update(np.asarray(model.collide_pairs).tobytes())
    h.update(np.asarray(model.joint_rbi0).tobytes())
    h.update(np.asarray(model.joint_rbi1).tobytes())
    return h.hexdigest()[:12]


def build_dynamics_plan(model, CS: int, contacts_mode: str = "exact",
                        use_contacts: bool = True) -> SolvePlan:
    """Solve plan for the main-fit / multistep FitPointCloud row structure:
    [CS single-body linear slots][joint nailed U=3][contact U=3 friction];
    angular: [joint ranges U=6] (physmodel.h:321-334, physics.h:451-489)."""
    key = f"dyn:{_model_digest(model)}:{CS}:{contacts_mode}:{use_contacts}"
    if key in _PLANS:
        return _PLANS[key]
    massinv = np.asarray(model.massinv)
    B = massinv.shape[0]
    j0 = np.asarray(model.joint_rbi0)
    j1 = np.asarray(model.joint_rbi1)
    from .contacts import CONTACT_POINTS
    lin_classes = [build_pair_class("lin", j0, j1, 3, massinv, B)]
    if use_contacts:
        pairs = np.asarray(model.collide_pairs)
        lin_classes.append(build_pair_class(
            "lin", pairs[:, 0], pairs[:, 1], 3 * CONTACT_POINTS, massinv, B,
            friction=True, mode=contacts_mode))
    ang_classes = [build_pair_class("ang", j0, j1, 6, massinv, B)]
    return register_plan(SolvePlan(key=key, CS=CS,
                                   lin_classes=tuple(lin_classes),
                                   ang_classes=tuple(ang_classes),
                                   massinv=massinv))


def build_multistep_plan(model, CS: int, has_angles: bool,
                         contacts_mode: str = "exact",
                         use_contacts: bool = True) -> SolvePlan:
    """Plan for one MultiStepSim step (handtrack.h:658-688): same linear
    structure as the dynamics plan, plus the ApplyAngles palm drive (U=3) and
    finger cones (U=1) ahead of the joint ranges when has_angles."""
    key = (f"ms:{_model_digest(model)}:{CS}:{int(has_angles)}:"
           f"{contacts_mode}:{use_contacts}")
    if key in _PLANS:
        return _PLANS[key]
    massinv = np.asarray(model.massinv)
    B = massinv.shape[0]
    j0 = np.asarray(model.joint_rbi0)
    j1 = np.asarray(model.joint_rbi1)
    from .contacts import CONTACT_POINTS
    lin_classes = [build_pair_class("lin", j0, j1, 3, massinv, B)]
    if use_contacts:
        pairs = np.asarray(model.collide_pairs)
        lin_classes.append(build_pair_class(
            "lin", pairs[:, 0], pairs[:, 1], 3 * CONTACT_POINTS, massinv, B,
            friction=True, mode=contacts_mode))
    ang_classes = []
    if has_angles:
        # tracker.runtime.apply_angles emission: drive (world,1) then cones
        cone_b1 = [4]
        for finger in (1, 2, 3, 4):
            cone_b1 += [3 + finger * 3, 2 + finger * 3]
        ang_classes.append(build_pair_class("ang", [-1], [1], 3, massinv, B))
        ang_classes.append(build_pair_class(
            "ang", [1] * 9, cone_b1, 1, massinv, B))
    # hand_model_enhancements armdir cone (world, 0) — every multistep step
    ang_classes.append(build_pair_class("ang", [-1], [0], 1, massinv, B))
    ang_classes.append(build_pair_class("ang", j0, j1, 6, massinv, B))
    return register_plan(SolvePlan(key=key, CS=CS,
                                   lin_classes=tuple(lin_classes),
                                   ang_classes=tuple(ang_classes),
                                   massinv=massinv))


def build_unibody_plan(CS: int) -> SolvePlan:
    """Plan for UnibodyFit (handtrack.h:444-470): one free body, CS cloud
    rows solved in exact sequential order, no pair classes.  The in-kernel
    slot loop replaces the XLA fori over rows (the reset path's dominant
    cost: 20 sweeps x CS sequential loop steps per fit)."""
    key = f"uni:{CS}"
    if key in _PLANS:
        return _PLANS[key]
    return register_plan(SolvePlan(key=key, CS=CS, lin_classes=(),
                                   ang_classes=(),
                                   massinv=np.ones(1, np.float32),
                                   bp=8))


def physics_update_pgs(state: BodyState, bodies: BodyParams,
                       single_rows, lin_rows: Sequence[LinearRows],
                       ang_rows: Sequence[AngularRows], plan: SolvePlan,
                       params: PhysicsParams, iterations: int = 16,
                       iterations_post: int = 4) -> BodyState:
    """PhysicsUpdate with the VMEM-resident PGS kernel (batched under vmap).

    single_rows: SingleBodyLinear with CS = plan.CS slots (or None).
    lin_rows / ang_rows: per-class row SoAs matching plan.*_classes (b0/b1
    fields are ignored — the plan's static body ids are authoritative).
    """
    solve = _get_solver(plan.key, iterations, iterations_post)
    return solve(state, bodies, single_rows, tuple(lin_rows), tuple(ang_rows),
                 params)
