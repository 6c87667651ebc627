"""Pallas kernel: the whole cloud-constraint pipeline for one track in VMEM.

Fuses, per point (physmodel.h:137-181 + the pack step of physics/colored.py):
  closest()        — sphere + hull most-above candidates, strict-< winner scan
  ConvexHitCheck   — slab clip of the camera ray against the winner's hull
  CloudConstraint  — row geometry (normal / lever / targetdist / force scale)
  slot packing     — per-body rank (roll-based lane cumsum) and the (slot,
                     body) scatter as exact 3-way-bf16-split one-hot
                     matmuls on the MXU

so the only HBM traffic is the inputs (points + world planes) and the packed
(slots, bodies, channels) block.  The XLA formulation materialises several
(bodies, points, ...) tensors and a (points, bodies)-ranked scatter; this
kernel keeps all of it on-chip.

Equivalences vs fitting/cloud.py (the reference-shaped path, still used on
CPU and by unpacked callers): sphere value computed as |p-pos|-r (same up to
rounding), hull winner extracted by value-match (exact ties between distinct
planes of one hull would blend normals — measure-zero for fp dots).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BP = 24          # body slots (17 padded)
FLT_MAX = 3.4028235e38


def _make_kernel(B: int, P: int, C: int, directed: bool, pack: bool = True,
                 vals_only: bool = False, batched: bool = False,
                 solve_ch: bool = False):
    """solve_ch: pack ONLY the 12 solve-prep channels
    [n(3), J1(3), K1(3), dinv, tsm, scale] (the fused path's consumption
    set — tsp/force limits derive outside) instead of the 16-channel
    parity set; shrinks the dominant scatter matmul 16B -> 12B rows."""

    def kernel(pts_ref, planest_ref, body_ref, misc_ref,
               packed_ref, counts_ref=None):
        if batched:          # (1, ...) leading block dim per grid instance
            pts = pts_ref[0]
            pt5 = planest_ref[0]
            body16 = body_ref[0]
            misc = misc_ref[0]
        else:
            pts = pts_ref[:]                              # (8, N)
            pt5 = planest_ref[:]                          # (5P, B)
            body16 = body_ref[:]                          # (16, BP) rows
            misc = misc_ref[:]
        # the body scalars arrive as (16, BP) channel ROWS (natural stack
        # layout in XLA — the old (BP, 16) column form cost ~0.6 ms of
        # .at-chain relayout per call at T=512); one tiny transpose here
        body = jnp.swapaxes(body16, 0, 1)                 # (BP, 16)
        N = pts.shape[1]
        p3 = pts[0:3]
        mask = pts[4:5]                                   # (1, N) 0/1

        # hull most-above candidate VALUES per body, straight from the
        # (5P, B) channel input: body b's coefficients are LANE COLUMNS
        # (P, 1) of each channel slab — no (B*P, 8) row-major input (its
        # XLA production cost a pathological ~0.6 ms relayout copy per
        # call at T=512) and no in-kernel transpose.  Same FMA chain and
        # per-body max set as the old bulk (B*P, N) dots, on perfectly
        # tiled (P, N) slabs.
        hvals = jnp.concatenate([
            jnp.max(pt5[0 * P:1 * P, b:b + 1] * p3[0:1]
                    + pt5[1 * P:2 * P, b:b + 1] * p3[1:2]
                    + pt5[2 * P:3 * P, b:b + 1] * p3[2:3]
                    + pt5[3 * P:4 * P, b:b + 1],
                    axis=0, keepdims=True)
            for b in range(B)], axis=0)                   # (B, N)

        ox = misc[0, 0]
        oy = misc[0, 1]
        oz = misc[0, 2]

        # Winner = reference scan order (all sphere candidates then all hull
        # candidates, strict < — physmodel.h:141-150 then :127-135), computed
        # as ONE batched earliest-index argmin over the 2B candidates: the
        # sequential strict-< scan keeps the first minimum, which is exactly
        # min index among value==min.  (The old 34-step select chain paid
        # ~10 sublane-padded (1, N) ops per candidate.)
        posx = body[0:B, 0:1]
        posy = body[0:B, 1:2]
        posz = body[0:B, 2:3]
        dxb = p3[0:1] - posx                              # (B, N)
        dyb = p3[1:2] - posy
        dzb = p3[2:3] - posz
        dist = jnp.sqrt(dxb * dxb + dyb * dyb + dzb * dzb)
        svals = dist - body[0:B, 3:4]                     # (B, N)

        vals2 = jnp.concatenate([svals, hvals], axis=0)   # (2B, N)
        best = jnp.min(vals2, axis=0, keepdims=True)      # (1, N)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (2 * B, N), 0)
        widx = jnp.min(jnp.where(vals2 == best, iota_c, 2 * B), axis=0,
                       keepdims=True)                     # (1, N)
        use_hull = widx >= B
        wb_i = jnp.where(use_hull, widx - B, widx)        # (1, N) winner body
        wb = wb_i.astype(jnp.float32)

        # winner body fields + sphere normal, via one-hot masked reduces
        ohb = (jax.lax.broadcasted_iota(jnp.int32, (B, N), 0)
               == wb_i).astype(jnp.float32)               # (B, N)
        pick_b = lambda col: jnp.sum(ohb * col, axis=0, keepdims=True)
        wpx = pick_b(posx)
        wpy = pick_b(posy)
        wpz = pick_b(posz)
        wsc = pick_b(body[0:B, 4:5])
        inv = 1.0 / jnp.maximum(pick_b(dist), 1e-20)
        wnx = pick_b(dxb) * inv
        wny = pick_b(dyb) * inv
        wnz = pick_b(dzb) * inv

        if vals_only:
            # FitError's correspondence: winner (value, body) per point only
            res_v = jnp.concatenate(
                [best, wb, mask, jnp.zeros((13, N), jnp.float32)], axis=0)
            if batched:
                packed_ref[0] = res_v
            else:
                packed_ref[:] = res_v
            return

        # winner body's plane block via ONE exact one-hot MXU gather: the
        # planes ride (5P, B) channel rows [n.x | n.y | n.z | d | d0] and
        # are split into three TRUNCATED bf16 planes (any f32 is exactly the
        # sum of three 8-bit-mantissa chunks; every split/residual step is
        # exact by Sterbenz), so three DEFAULT bf16 matmuls against the 0/1
        # winner one-hot reconstruct the winner's plane block BITWISE — the
        # old 17-iteration (P, N) select chain was ~half the kernel's VPU
        # cycles.  dw is then recomputed with the same FMA expression as
        # the hvals dots (identical values and op order -> identical bits,
        # so the ohm == compare below still matches exactly).
        ohb16 = ohb.astype(jnp.bfloat16)                  # (B, N) 0/1
        h1 = pt5.astype(jnp.bfloat16)
        r1 = pt5 - h1.astype(jnp.float32)
        h2 = r1.astype(jnp.bfloat16)
        h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)

        def gsel(hk):
            return jax.lax.dot_general(
                hk, ohb16, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)      # (5P, N)

        sel = (gsel(h1) + gsel(h2)) + gsel(h3)
        pnx = sel[0:P]
        pny = sel[P:2 * P]
        pnz = sel[2 * P:3 * P]
        dw = pnx * p3[0:1] + pny * p3[1:2] + pnz * p3[2:3] + sel[3 * P:4 * P]
        if directed:
            dw0 = sel[4 * P:5 * P]

        # hull-winner normal: mean of the winner body's maximal planes
        # (same blend-on-ties semantics as the reference's mostabove pick);
        # only meaningful where the hull candidate won the strict-< scan.
        # The compare is against dw's OWN max (not `best`): the compiler may
        # fuse the dw FMA chain differently from the hvals one it was
        # derived from, so the two can disagree in the last ulp — a
        # self-consistent max keeps the maximal-plane set exact under any
        # fusion
        ohm = (dw == jnp.max(dw, axis=0, keepdims=True)).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(ohm, axis=0, keepdims=True), 1.0)
        hx = jnp.sum(ohm * pnx, axis=0, keepdims=True) / cnt
        hy = jnp.sum(ohm * pny, axis=0, keepdims=True) / cnt
        hz = jnp.sum(ohm * pnz, axis=0, keepdims=True) / cnt
        wnx = jnp.where(use_hull, hx, wnx)
        wny = jnp.where(use_hull, hy, wny)
        wnz = jnp.where(use_hull, hz, wnz)

        if directed:
            # slab clip of the camera ray against the winner's hull
            miss = jnp.max(jnp.where((dw0 >= 0) & (dw >= 0), 1.0, 0.0),
                           axis=0, keepdims=True)
            denom = dw0 - dw
            t = jnp.where(denom != 0,
                          dw0 / jnp.where(denom == 0, 1.0, denom), 0.0)
            te = jnp.max(jnp.where((dw0 >= 0) & (dw < 0), t, 0.0),
                         axis=0, keepdims=True)
            tx = jnp.min(jnp.where((dw0 <= 0) & (dw > 0), t, 1.0),
                         axis=0, keepdims=True)
            hit = (miss == 0) & (te <= tx)

            rx = p3[0:1] - ox
            ry = p3[1:2] - oy
            rz = p3[2:3] - oz
            rinv = 1.0 / jnp.maximum(jnp.sqrt(rx * rx + ry * ry + rz * rz),
                                     1e-20)
            front = (rx * wnx + ry * wny + rz * wnz) > 0
            use_ray = front & hit
            w1x = jnp.where(use_ray, ox + rx * te, p3[0:1] - wnx * best)
            w1y = jnp.where(use_ray, oy + ry * te, p3[1:2] - wny * best)
            w1z = jnp.where(use_ray, oz + rz * te, p3[2:3] - wnz * best)
            nxf = jnp.where(use_ray, rx * rinv, wnx)
            nyf = jnp.where(use_ray, ry * rinv, wny)
            nzf = jnp.where(use_ray, rz * rinv, wnz)
        else:
            w1x = p3[0:1] - wnx * best
            w1y = p3[1:2] - wny * best
            w1z = p3[2:3] - wnz * best
            nxf, nyf, nzf = wnx, wny, wnz

        td = ((w1x - p3[0:1]) * nxf + (w1y - p3[1:2]) * nyf
              + (w1z - p3[2:3]) * nzf)
        active = mask > 0

        if not pack:
            # unpacked: rows in point-slot order with WORLD attach points
            # (the unibody retarget subtracts its own body position outside)
            res_u = jnp.concatenate(
                [nxf, nyf, nzf, w1x, w1y, w1z, td,
                 active.astype(jnp.float32),
                 jnp.zeros((8, N), jnp.float32)], axis=0)  # (16, N)
            if batched:
                packed_ref[0] = res_u
            else:
                packed_ref[:] = res_u
            return

        r1x = w1x - wpx
        r1y = w1y - wpy
        r1z = w1z - wpz

        # solve-prep geometry per point (the per-row math of
        # pgs_kernel._prep_singles, moved in-kernel so the packed block is
        # already in the solve kernel's channel set and the XLA
        # SingleBodyLinear round trip + re-prep disappears from the fused
        # path): J1 = r1 x n, K1 = Iinv_w(winner) @ J1,
        # dinv = 1/(massinv_w + (K1 x r1).n).  Same FMA expressions and
        # association order as _prep_singles for value parity.
        Jx = r1y * nzf - r1z * nyf
        Jy = r1z * nxf - r1x * nzf
        Jz = r1x * nyf - r1y * nxf
        mi_w = pick_b(body[0:B, 5:6])
        iw = [pick_b(body[0:B, 6 + k:7 + k]) for k in range(9)]
        Kx = iw[0] * Jx + iw[1] * Jy + iw[2] * Jz
        Ky = iw[3] * Jx + iw[4] * Jy + iw[5] * Jz
        Kz = iw[6] * Jx + iw[7] * Jy + iw[8] * Jz
        ccx = Ky * r1z - Kz * r1y
        ccy = Kz * r1x - Kx * r1z
        ccz = Kx * r1y - Ky * r1x
        denom = mi_w + (ccx * nxf + ccy * nyf + ccz * nzf)
        dinv = jnp.where(active & (denom != 0),
                         1.0 / jnp.where(denom == 0, 1.0, denom), 0.0)

        # per-body rank among active points (lane roll-scan), then pack
        bodyi = wb.astype(jnp.int32)
        oh = ((jax.lax.broadcasted_iota(jnp.int32, (BP, N), 0) == bodyi)
              & active).astype(jnp.float32)               # (BP, N)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BP, N), 1)
        cum = oh
        k = 1
        while k < N:
            r = pltpu.roll(cum, k, axis=1)
            cum = cum + jnp.where(lane >= k, r, 0.0)
            k *= 2
        cbc = jnp.broadcast_to(cum[:, N - 1:N], (BP, 128))
        if batched:
            counts_ref[0] = cbc
        else:
            counts_ref[:] = cbc
        rank = jnp.sum(oh * (cum - 1.0), axis=0, keepdims=True)  # (1, N)
        cnt = jnp.sum(oh * cum[:, N - 1:N], axis=0, keepdims=True)  # (1, N)

        # over-cap bodies keep a UNIFORM subset: rank r -> slot (r*C)//cnt,
        # first occurrence wins (matches pack_single_body_linear; the f32
        # floors are exact — r*C < 2^24 and the true quotient is >= 1/cnt
        # from any integer, far beyond an ulp).  Tail truncation biased the
        # fit by cutting the raster-order bottom of each body's points.
        thin = cnt > C
        safe = jnp.maximum(cnt, 1.0)
        nr = jnp.where(thin, jnp.floor(rank * C / safe), rank)
        prev = jnp.floor((rank - 1.0) * C / safe)
        keep = (~thin) | (rank == 0) | (nr > prev)        # (1, N)
        # thinned bodies keep their TOTAL force budget (force-limit scale
        # count/slots per surviving row — same form as
        # pack_single_body_linear for bit-identity)
        comp = jnp.where(thin, cnt * (1.0 / C), 1.0)
        wsc = wsc * comp

        if solve_ch:
            # tsm = targetdist / dt * act: the same divide as _prep_singles
            # (act multiply is a no-op for packed points — only active ones
            # scatter)
            dt = misc[0, 3]
            tsm = td / dt
            vals = jnp.concatenate(
                [nxf, nyf, nzf, Jx, Jy, Jz, Kx, Ky, Kz, dinv, tsm, wsc],
                axis=0)                                  # (12, N)
        else:
            # channel set [n(3), J1(3), K1(3), dinv, r1(3), td, wsc, act]:
            # rows 0-9 are the solve-prep channels, rows 10-15 the raw
            # reference fields (SingleBodyLinear reconstruction + parity
            # tests)
            vals = jnp.concatenate(
                [nxf, nyf, nzf, Jx, Jy, Jz, Kx, Ky, Kz, dinv,
                 r1x, r1y, r1z, td, wsc,
                 active.astype(jnp.float32)], axis=0)    # (16, N)
        CH = vals.shape[0]
        # factorized scatter: code = wb*C + slot splits into the body mask
        # (oh, thin-filtered) x the shared slot one-hot.  All B bodies'
        # masked channel stacks ride ONE (16B, N)x(N, C) contraction — the
        # MXU streams 16B rows in one pass instead of paying B small-M
        # matmuls.  Each (body, slot) output receives at most one point
        # (kept slots are unique per body), so the sums are exact.
        rankT = jnp.transpose(nr, (1, 0))                 # (N, 1)
        keepT = jnp.transpose(keep.astype(jnp.float32), (1, 0))  # (N, 1)
        iota_c = jax.lax.broadcasted_iota(
            jnp.int32, (N, C), 1).astype(jnp.float32)
        ohr = (((iota_c == rankT) & (rankT < C)).astype(jnp.float32)
               * keepT)
        big = jnp.concatenate([vals * oh[b:b + 1] for b in range(B)],
                              axis=0)                     # (CH*B, N)
        # exact 3-way bf16 split of the data side (every f32 is the sum of
        # three 8-bit-mantissa chunks; each output element is a SINGLE-term
        # sum through the 0/1 one-hot, so three DEFAULT bf16 passes
        # reconstruct the f32 HIGHEST result bitwise at half the MXU passes)
        ohr16 = ohr.astype(jnp.bfloat16)
        g1 = big.astype(jnp.bfloat16)
        gr = big - g1.astype(jnp.float32)
        g2 = gr.astype(jnp.bfloat16)
        g3 = (gr - g2.astype(jnp.float32)).astype(jnp.bfloat16)

        def gscat(gk):
            return jax.lax.dot_general(
                gk, ohr16, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)      # (16B, C)

        res = (gscat(g1) + gscat(g2)) + gscat(g3)
        for b in range(B):
            if batched:
                packed_ref[0, :, b * C:(b + 1) * C] = res[b * CH:(b + 1) * CH]
            else:
                packed_ref[:, b * C:(b + 1) * C] = res[b * CH:(b + 1) * CH]
        if B < BP:
            zf = jnp.zeros((CH, (BP - B) * C), jnp.float32)
            if batched:
                packed_ref[0, :, B * C:] = zf
            else:
                packed_ref[:, B * C:] = zf

    return kernel


@functools.partial(jax.jit, static_argnames=("C", "directed", "solve_ch"))
def _cloud_rows_call(pts_h, planes_t, body_sc, misc, C, directed,
                     solve_ch=False):
    from ..physics.pgs_kernel import _interpret
    P, B = planes_t.shape[0] // 5, planes_t.shape[1]
    CH = 12 if solve_ch else 16
    kernel = _make_kernel(B, P, C, directed, solve_ch=solve_ch)
    packed, counts = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((CH, BP * C), jnp.float32),
                   jax.ShapeDtypeStruct((BP, 128), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=_interpret(),
    )(pts_h, planes_t, body_sc, misc)
    return packed, counts


def _bspecs(shapes):
    return [pl.BlockSpec((1,) + sh, (lambda i, n=len(sh): (i,) + (0,) * n),
                         memory_space=pltpu.VMEM) for sh in shapes]


@functools.partial(jax.jit, static_argnames=("C", "directed", "solve_ch"))
def _cloud_rows_call_b(pts_h, planes_t, body_sc, misc, C,
                       directed, solve_ch=False):
    """Batched (T-leading) variant with an explicit parallel grid over
    tracks — vmap-of-pallas serializes per-instance DMA against compute."""
    from ..physics.pgs_kernel import _interpret
    T = pts_h.shape[0]
    P, B = planes_t.shape[1] // 5, planes_t.shape[2]
    CH = 12 if solve_ch else 16
    kernel = _make_kernel(B, P, C, directed, batched=True,
                          solve_ch=solve_ch)
    N = pts_h.shape[2]
    packed, counts = pl.pallas_call(
        kernel,
        grid=(T,),
        out_shape=(jax.ShapeDtypeStruct((T, CH, BP * C), jnp.float32),
                   jax.ShapeDtypeStruct((T, BP, 128), jnp.float32)),
        in_specs=_bspecs([(8, N), (5 * P, B), (16, BP), (8, 8)]),
        out_specs=tuple(_bspecs([(CH, BP * C), (BP, 128)])),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(pts_h, planes_t, body_sc, misc)
    return packed, counts


@functools.partial(jax.jit, static_argnames=("directed", "vals_only"))
def _cloud_rows_unpacked_call(pts_h, planes_t, body_sc, misc,
                              directed, vals_only=False):
    from ..physics.pgs_kernel import _interpret
    P, B = planes_t.shape[0] // 5, planes_t.shape[1]
    N = pts_h.shape[1]
    kernel = _make_kernel(B, P, 0, directed, pack=False, vals_only=vals_only)
    (vals,) = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((16, N), jnp.float32),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=_interpret(),
    )(pts_h, planes_t, body_sc, misc)
    return vals


@functools.partial(jax.jit, static_argnames=("directed", "vals_only"))
def _cloud_rows_unpacked_call_b(pts_h, planes_t, body_sc, misc,
                                directed, vals_only=False):
    from ..physics.pgs_kernel import _interpret
    T = pts_h.shape[0]
    P, B = planes_t.shape[1] // 5, planes_t.shape[2]
    N = pts_h.shape[2]
    kernel = _make_kernel(B, P, 0, directed, pack=False, vals_only=vals_only,
                          batched=True)
    (vals,) = pl.pallas_call(
        kernel,
        grid=(T,),
        out_shape=(jax.ShapeDtypeStruct((T, 16, N), jnp.float32),),
        in_specs=_bspecs([(8, N), (5 * P, B), (16, BP), (8, 8)]),
        out_specs=tuple(_bspecs([(16, N)])),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(pts_h, planes_t, body_sc, misc)
    return vals


_ROWS_CV: dict = {}


def _rows_cv(kind: str, C: int, directed: bool, vals_only: bool = False):
    """custom_vmap entries so the TRACKS vmap lowers to the explicit
    parallel-grid batched calls instead of vmap-of-pallas."""
    key = (kind, C, directed, vals_only)
    if key in _ROWS_CV:
        return _ROWS_CV[key]
    from jax.custom_batching import custom_vmap

    if kind in ("pack", "solve"):
        @custom_vmap
        def f(pts_h, planes_t, body_sc, misc):
            return _cloud_rows_call(pts_h, planes_t, body_sc,
                                    misc, C, directed,
                                    solve_ch=kind == "solve")
    else:
        @custom_vmap
        def f(pts_h, planes_t, body_sc, misc):
            return _cloud_rows_unpacked_call(pts_h, planes_t,
                                             body_sc, misc, directed,
                                             vals_only=vals_only)

    @f.def_vmap
    def f_vmap(axis_size, in_batched, *args):
        T = axis_size
        args = [a if b else jnp.broadcast_to(a, (T,) + a.shape)
                for a, b in zip(args, in_batched)]
        if kind in ("pack", "solve"):
            out = _cloud_rows_call_b(*args, C, directed,
                                     solve_ch=kind == "solve")
            return out, (True, True)
        out = _cloud_rows_unpacked_call_b(*args, directed,
                                          vals_only=vals_only)
        return out, True

    _ROWS_CV[key] = f
    return f


def _kernel_inputs_ph(state, model, pts_h, origin):
    """Shared prep with the point planes ph (8, N) [x, y, z, 1, mask, ...]
    already in the kernel's native layout (no (N, 3) relayout).

    The world-plane transform (Pose::TransformPlane) is computed CHANNEL-
    MAJOR: every op runs on (P, B) slabs with (1, B) quaternion/position
    broadcasts, emitting the kernel's (5P, B) planes_t input natively.  The
    old route built (B, P, 8) row-major planes and transposed — a
    pathological minor-dim relayout copy (~0.6 ms/call at T=512).  The qrot
    expansion mirrors maths.quat.qrot term for term (t = 2 qv x v;
    v + w t + qv x t) and the d/d0 sums keep the same association order as
    world_planes/einsum, so values are unchanged."""
    B = model.planes.shape[0]
    pl_c = jnp.asarray(model.planes)                       # (B, P, 4) const
    nlx = pl_c[..., 0].T                                   # (P, B) constants
    nly = pl_c[..., 1].T
    nlz = pl_c[..., 2].T
    dl = pl_c[..., 3].T
    mask_t = jnp.asarray(model.plane_mask).T               # (P, B) const
    q = state.pose[:, 3:7]
    qx, qy, qz, qw = (q[:, 0][None], q[:, 1][None], q[:, 2][None],
                      q[:, 3][None])                       # (1, B)
    tx = 2.0 * (qy * nlz - qz * nly)
    ty = 2.0 * (qz * nlx - qx * nlz)
    tz = 2.0 * (qx * nly - qy * nlx)
    wnx = nlx + qw * tx + (qy * tz - qz * ty)
    wny = nly + qw * ty + (qz * tx - qx * tz)
    wnz = nlz + qw * tz + (qx * ty - qy * tx)
    px = state.pose[:, 0][None]
    py = state.pose[:, 1][None]
    pz = state.pose[:, 2][None]
    wnx = jnp.where(mask_t, wnx, 0.0)
    wny = jnp.where(mask_t, wny, 0.0)
    wnz = jnp.where(mask_t, wnz, 0.0)
    ww = dl - (px * wnx + py * wny + pz * wnz)
    ww = jnp.where(mask_t, ww, -1e9)
    d0 = (origin[0] * wnx + origin[1] * wny + origin[2] * wnz) + ww
    d0 = jnp.where(mask_t, d0, -1.0)
    planes_t = jnp.concatenate([wnx, wny, wnz, ww, d0], axis=0)  # (5P, B)
    # body scalar columns: [pos(3), radius, force scale, massinv, iinv(9)]
    # (iinv/massinv feed the in-kernel solve-prep channels; the same
    # _batched_world_iinv formulation the solve prep uses, for value parity)
    from ..physics.pgs_kernel import _batched_world_iinv
    iinv = _batched_world_iinv(state.pose[None, :, 3:7],
                               model.tensorinv_massless,
                               model.massinv)[0]           # (B, 3, 3)
    zb = jnp.zeros(B, jnp.float32)
    rows = [state.pose[:, 0], state.pose[:, 1], state.pose[:, 2],
            jnp.broadcast_to(jnp.asarray(model.radius_inner), (B,)),
            zb,                                            # force scale slot
            jnp.broadcast_to(jnp.asarray(model.massinv), (B,))]
    rows += [iinv[:, i, j] for i in range(3) for j in range(3)]
    rows.append(zb)
    body_sc = jnp.pad(jnp.stack(rows, axis=0), ((0, 0), (0, BP - B)))
    misc = jnp.zeros((8, 8), jnp.float32).at[0, 0:3].set(origin)
    return planes_t, body_sc, misc


def points_planes(points, point_mask):
    """(N, 3) points + mask -> the ph (8, N) planes carrier."""
    N = points.shape[0]
    pts_h = jnp.zeros((8, N), jnp.float32)
    return (pts_h.at[0:3].set(points.T).at[3].set(1.0)
            .at[4].set(point_mask.astype(jnp.float32)))


def _kernel_inputs(state, model, points, point_mask, origin):
    pts_h = points_planes(points, point_mask)
    planes_t, body_sc, misc = _kernel_inputs_ph(state, model, pts_h, origin)
    return planes_t, pts_h, body_sc, misc


def cloud_vals(state, model, points, point_mask):
    """Winner (body, value) per point, in VMEM (FitError's correspondence,
    handtrack.h:372-383).  Same winner-scan semantics as cloud_rows_packed;
    sphere value is |p-pos|-r (equal to the plane form up to rounding)."""
    return cloud_vals_ph(state, model, points_planes(points, point_mask))


def cloud_vals_ph(state, model, pts_h):
    """cloud_vals on the planes carrier ph (8, N) (mask = row 4)."""
    planes_t, body_sc, misc = _kernel_inputs_ph(
        state, model, pts_h, jnp.zeros(3, jnp.float32))
    vals = _rows_cv("unpacked", 0, False, vals_only=True)(
        pts_h, planes_t, body_sc, misc)
    return vals[1].astype(jnp.int32), vals[0]


def cloud_rows_unibody(state, model, points, point_mask, origin, uni_pos,
                       force):
    """CloudConstraints retargeted to the UnibodyFit free body
    (handtrack.h:453-461): correspondence against the full hand, rows in
    point-slot order on body 0 with r1 measured from `uni_pos` and force
    limits +-force.  Returns a SingleBodyLinear block with B=1."""
    from ..physics.colored import SingleBodyLinear
    planes_t, pts_h, body_sc, misc = _kernel_inputs(
        state, model, points, point_mask, origin)
    vals = _rows_cv("unpacked", 0, True)(pts_h, planes_t, body_sc, misc)
    x = vals.T                                             # (N, 16)
    n, w1, td = x[:, 0:3], x[:, 3:6], x[:, 6]
    act = x[:, 7] > 0.5
    N = points.shape[0]
    f = jnp.full((N, 1), force, jnp.float32)
    return SingleBodyLinear(
        normal=n[:, None, :], r1=(w1 - uni_pos)[:, None, :],
        targetdist=td[:, None],
        targetspeednobias=jnp.zeros((N, 1), jnp.float32),
        fmin=-f, fmax=f, active=act[:, None])


def cloud_rows_packed(state, model, points, point_mask, origin,
                      scale_per_body, slots: int, directed: bool = True):
    """CloudConstraints + per-body slot packing, fully fused.

    Returns (SingleBodyLinear with (slots, B, ...) leaves, dropped (B,)):
    the same block pack_single_body_linear builds from cloud_constraint_rows,
    with force limits fmin/fmax = -/+ scale_per_body[winner].  `dropped` is
    the per-body count of rows lost to the slot cap (reference semantics has
    no cap, physmodel.h:163-181 — observability per VERDICT r1 item 10).
    """
    return cloud_rows_packed_ph(state, model,
                                points_planes(points, point_mask), origin,
                                scale_per_body, slots, directed)


def cloud_rows_packed_ph(state, model, pts_h, origin, scale_per_body,
                         slots: int, directed: bool = True):
    """cloud_rows_packed on the planes carrier ph (8, N) (mask = row 4)."""
    from ..physics.colored import SingleBodyLinear

    packed, counts = cloud_rows_packed_planes_ph(
        state, model, pts_h, origin, scale_per_body, slots, directed)
    B = model.planes.shape[0]
    x = packed.reshape(16, BP, slots).transpose(2, 1, 0)[:, :B, :]  # (C,B,16)
    scale = x[..., 14]
    blk = SingleBodyLinear(
        normal=x[..., 0:3], r1=x[..., 10:13], targetdist=x[..., 13],
        targetspeednobias=jnp.zeros_like(x[..., 13]),
        fmin=-scale, fmax=scale, active=x[..., 15] > 0.5)
    dropped = jnp.maximum(counts[:B, 0] - slots, 0.0)
    return blk, dropped


def cloud_rows_packed_planes_ph(state, model, pts_h, origin, scale_per_body,
                                slots: int, directed: bool = True):
    """The raw kernel output of cloud_rows_packed_ph: (16, BP*slots) packed
    channels [n(3), J1(3), K1(3), dinv, r1(3), targetdist, scale, active]
    (body-major slot blocks), plus the per-body counts.  Rows 0-9 are the
    solve kernel's prepped channels (physics/fused_fit consumes them with
    ONE transpose — no SingleBodyLinear round trip); rows 10-15 reconstruct
    the reference-shaped block bit-identically (cloud_rows_packed_ph)."""
    B = model.planes.shape[0]
    planes_t, body_sc, misc = _kernel_inputs_ph(
        state, model, pts_h, origin)
    body_sc = body_sc.at[4, :B].set(jnp.broadcast_to(scale_per_body, (B,)))
    return _rows_cv("pack", slots, directed)(
        pts_h, planes_t, body_sc, misc)


def cloud_rows_solve_ph(state, model, pts_h, origin, scale_per_body,
                        slots: int, dt, directed: bool = True):
    """The 12-channel solve-prep pack: (12, BP*slots) channels
    [n(3), J1(3), K1(3), dinv, tsm, scale] + per-body counts.  Same
    correspondence/pack as cloud_rows_packed_ph with the dominant scatter
    matmul shrunk 16B -> 12B rows; tsm = targetdist/dt computed in-kernel.
    Consumed by physics/fused_fit's batched rule only (the unbatched parity
    fallback uses the 16-channel reconstruction path)."""
    B = model.planes.shape[0]
    planes_t, body_sc, misc = _kernel_inputs_ph(
        state, model, pts_h, origin)
    body_sc = body_sc.at[4, :B].set(jnp.broadcast_to(scale_per_body, (B,)))
    misc = misc.at[0, 3].set(dt)
    return _rows_cv("solve", slots, directed)(
        pts_h, planes_t, body_sc, misc)
