"""Pallas TPU kernel: per-pair contact SAT + refine + manifold in VMEM.

Same math as physics/contacts.py's tracks-last batched path (reference
semantics: gjk.h:608-643 contact patches consumed at physics.h:451-489),
but the (pairs, planes, verts, tracks) separation grid never touches HBM:
world verts/planes stream in once per 128-track block and every per-pair
reduction (face max-min, support refinement, manifold argmin) happens on
VMEM-resident (planes|verts, tracks) tiles.  The XLA formulation streams
~1.6 GB of fused intermediates per 512-track frame-step (measured ~13 ms on
v5e); this kernel reads the ~18 MB of world geometry instead.

Layout per grid step (TBLK = 128 tracks on lanes, all f32):
  vw   (3*B*48, T)  world vert component planes, rows c*B48 + body*48 + v
  nw   (3*B*96, T)  world face-normal planes
  dw   (B*96, T)    world plane offsets; masked-off planes carry -1e30 so
                    they can never win the face max (no masks in-kernel)
  aux  (B*16, T)    per body: spin(3) linvel(3) translation(3) radius@9
  pa/pb (NP,) SMEM  static collide-pair body ids
  scal (8,) SMEM    driftmax scalar
  out  (NP*48, T)   12 channels x 4 manifold points per pair, rows
                    i*48 + ch*4 + pt: [seps, vdotn, r0(3), r1(3), active,
                    n(3 broadcast)]

The v-loop inside the face step is a static 48-iteration unroll of 2D
(planes, T) FMAs — no 3D intermediates, no relayouts.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 256 tracks per grid step: ~2.2x the 128-lane throughput on v5e (VPU tiles
# run wider with the same (planes|verts, T) layout; 512 is slightly worse —
# the whole-batch block starts pressuring VMEM)
TBLK = int(__import__("os").environ.get("HTS_CONTACT_TBLK", "256"))
V = 48            # padded verts per hull (model invariant, bake.py)
P = 96            # padded planes per hull
NCH = 12          # output channels per manifold point


def _make_kernel(B: int, NP: int, n_points: int, refine_iters: int,
                 pairs=None):
    """pairs: optional static ((a, b), ...) — unrolls the pair loop with
    static body slices (no dynamic-slice loads; Mosaic vectorises the whole
    sweep).  None keeps the dynamic fori_loop (smaller program)."""
    B48, B96 = B * V, B * P

    def kernel(vw_ref, nw_ref, dw_ref, aux_ref, pa_ref, pb_ref, scal_ref,
               out_ref):
        driftmax = scal_ref[0]

        def pair_body(i, a, b):
            auxa = aux_ref[pl.ds(a * 16, 16), :]               # (16, T)
            auxb = aux_ref[pl.ds(b * 16, 16), :]

            # bounding-sphere pair cull (physics.h:456): per-lane gate, and
            # when no lane in the block is near, the whole SAT+refine+manifold
            # body is skipped (most pairs, most frames)
            dc2 = sum((auxa[6 + c:7 + c, :] - auxb[6 + c:7 + c, :]) ** 2
                      for c in range(3))                       # (1, T)
            rsum = auxa[9:10, :] + auxb[9:10, :]
            near = dc2 <= rsum * rsum                          # (1, T)

            def skip_pair(_):
                # inactive rows; n = (0,0,-1) keeps the downstream
                # quat_from_to(z, -n) away from the antiparallel singularity
                return jnp.concatenate(
                    [jnp.zeros((11 * n_points, TBLK), jnp.float32),
                     jnp.full((n_points, TBLK), -1.0, jnp.float32)], axis=0)

            def verts(body):
                return [vw_ref[pl.ds(c * B48 + body * V, V), :]
                        for c in range(3)]

            def faces(body):
                n = [nw_ref[pl.ds(c * B96 + body * P, P), :]
                     for c in range(3)]
                return n, dw_ref[pl.ds(body * P, P), :]

            def do_pair(_):
                va = verts(a)
                vb = verts(b)
                na, da = faces(a)
                nb, db = faces(b)
                iota_p = jax.lax.broadcasted_iota(jnp.int32, (P, TBLK), 0)
                iota_v = jax.lax.broadcasted_iota(jnp.int32, (V, TBLK), 0)

                def face_sep(n3, d0, vo):
                    """Winning face of one hull vs the other hull's verts.
                    Returns sep (1,T), nf 3x(1,T), dv (V,T)."""
                    dmin = None
                    for v in range(V):
                        dv_ = (n3[0] * vo[0][v:v + 1, :]
                               + n3[1] * vo[1][v:v + 1, :]
                               + n3[2] * vo[2][v:v + 1, :])
                        dmin = dv_ if dmin is None else jnp.minimum(dmin, dv_)
                    dmin = dmin + d0                               # (P, T)
                    sep = jnp.max(dmin, axis=0, keepdims=True)     # (1, T)
                    pri = jnp.where(dmin >= sep, iota_p, P)
                    first = jnp.min(pri, axis=0, keepdims=True)
                    oh = (iota_p == first).astype(jnp.float32)
                    nf = [jnp.sum(oh * n3[c], axis=0, keepdims=True)
                          for c in range(3)]
                    df = jnp.sum(oh * d0, axis=0, keepdims=True)
                    dv = (nf[0] * vo[0] + nf[1] * vo[1] + nf[2] * vo[2]
                          + df)                                    # (V, T)
                    return sep, nf, dv

                sep_a, nf_a, dv_a = face_sep(na, da, vb)
                sep_b, nf_b, dv_b = face_sep(nb, db, va)
                use_a = sep_a >= sep_b                             # (1, T)
                n = [jnp.where(use_a, nf_a[c], -nf_b[c]) for c in range(3)]

                def support(vx, m):
                    dots = vx[0] * m[0] + vx[1] * m[1] + vx[2] * m[2]
                    mx = jnp.max(dots, axis=0, keepdims=True)
                    pri = jnp.where(dots >= mx, iota_v, V)
                    first = jnp.min(pri, axis=0, keepdims=True)
                    oh = (iota_v == first).astype(jnp.float32)
                    return [jnp.sum(oh * vx[c], axis=0, keepdims=True)
                            for c in range(3)]

                def sep_along(m):
                    sa = support(va, m)
                    sb = support(vb, [-mc for mc in m])
                    return (sum((sb[c] - sa[c]) * m[c] for c in range(3)),
                            sa, sb)

                best = jnp.full((1, TBLK), -3.0e38, jnp.float32)
                m = n
                for _ in range(refine_iters):
                    s, sa, sb = sep_along(m)
                    best = jnp.maximum(best, s)
                    d = [sb[c] - sa[c] for c in range(3)]
                    norm = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
                    m = [dc / jnp.maximum(norm, 1e-20) for dc in d]
                s, _, _ = sep_along(m)
                sep_gate = jnp.maximum(best, s)
                active_pair = sep_gate < driftmax                  # (1, T)

                dv = jnp.where(use_a, dv_a, dv_b)                  # (V, T)
                dvx = [jnp.where(use_a, vb[c], va[c]) for c in range(3)]
                seps_l, deep_l = [], []
                for _ in range(n_points):
                    mn = jnp.min(dv, axis=0, keepdims=True)
                    pri = jnp.where(dv <= mn, iota_v, V)
                    first = jnp.min(pri, axis=0, keepdims=True)
                    oh = (iota_v == first).astype(jnp.float32)
                    seps_l.append(jnp.sum(oh * dv, axis=0, keepdims=True))
                    deep_l.append([jnp.sum(oh * dvx[c], axis=0, keepdims=True)
                                   for c in range(3)])
                    dv = jnp.where(oh > 0, 3.0e38, dv)
                seps = jnp.concatenate(seps_l, axis=0)             # (Pt, T)
                deep = [jnp.concatenate([dk[c] for dk in deep_l], axis=0)
                        for c in range(3)]
                shift = [n[c] * seps for c in range(3)]
                p1w = [jnp.where(use_a, deep[c], deep[c] + shift[c])
                       for c in range(3)]
                p0w = [jnp.where(use_a, deep[c] - shift[c], deep[c])
                       for c in range(3)]
                pt_active = ((active_pair > 0) & (seps < driftmax) & near
                             ).astype(jnp.float32)


                def vel_at(aux, pw):
                    sp = [aux[c:c + 1, :] for c in range(3)]
                    lv = [aux[3 + c:4 + c, :] for c in range(3)]
                    tr = [aux[6 + c:7 + c, :] for c in range(3)]
                    r = [pw[c] - tr[c] for c in range(3)]
                    cr = [sp[1] * r[2] - sp[2] * r[1],
                          sp[2] * r[0] - sp[0] * r[2],
                          sp[0] * r[1] - sp[1] * r[0]]
                    return [cr[c] + lv[c] for c in range(3)], r

                v0, r0 = vel_at(auxa, p0w)
                v1, r1 = vel_at(auxb, p1w)
                vdotn = sum((v0[c] - v1[c]) * (-n[c]) for c in range(3))

                nb3 = [jnp.broadcast_to(n[c], (n_points, TBLK)) for c in range(3)]
                out = jnp.concatenate(
                    [seps, vdotn, r0[0], r0[1], r0[2], r1[0], r1[1], r1[2],
                     pt_active, nb3[0], nb3[1], nb3[2]], axis=0)   # (48, T)
                return out

            out_ref[pl.ds(i * (NCH * n_points), NCH * n_points), :] = (
                jax.lax.cond(jnp.any(near), do_pair, skip_pair, 0))
            return 0

        if pairs is not None:
            for i, (a, b) in enumerate(pairs):
                pair_body(i, a, b)
        else:
            jax.lax.fori_loop(
                0, NP, lambda i, c: pair_body(i, pa_ref[i], pb_ref[i]), 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("B", "NP", "n_points",
                                             "refine_iters", "pairs"))
def _contact_fields_call(vw, nw, dw, aux, pa, pb, scal, B, NP, n_points,
                         refine_iters, pairs=None):
    from .pgs_kernel import _interpret
    T = vw.shape[1]
    Tp = -(-T // TBLK) * TBLK
    pad = [(0, 0), (0, Tp - T)]
    vw, nw, dw, aux = (jnp.pad(x, pad) for x in (vw, nw, dw, aux))
    kernel = _make_kernel(B, NP, n_points, refine_iters, pairs)
    grid = Tp // TBLK
    bs = lambda r: pl.BlockSpec((r, TBLK), lambda t: (0, t),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((NP * NCH * n_points, Tp), jnp.float32),
        in_specs=[bs(3 * B * V), bs(3 * B * P), bs(B * P), bs(B * 16),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((NP * NCH * n_points, TBLK), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # independent track blocks: double-buffer the grid-step DMA
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(vw, nw, dw, aux, pa, pb, scal)
    return out[:, :T]


def contact_fields(pose_b, lin_b, ang_b, model, params, n_points: int,
                   refine_iters: int = 3):
    """Kernel path for the batched contact fields.  Returns tracks-last
    planes matching contacts._contact_rows_batched's intermediates:
    (n 3x(NP,T), seps (NP,Pt,T), vdotn (NP,Pt,T), r0/r1 3x(NP,Pt,T),
    pt_active (NP,Pt,T)).  Requires the standard baked-model padding
    (48 verts, 96 plane slots); callers must check kernel_supported()."""
    import numpy as np
    from .contacts import _rot_planes

    T, B = pose_b.shape[0], pose_b.shape[1]
    pairs = np.asarray(model.collide_pairs)
    NP = pairs.shape[0]

    pt = jnp.transpose(pose_b, (1, 2, 0))                  # (B, 7, T)
    tr = [pt[:, c] for c in range(3)]
    R = _rot_planes(pt[:, 3], pt[:, 4], pt[:, 5], pt[:, 6])

    vl = [model.verts[..., j] for j in range(3)]
    nl = [model.planes[..., j] for j in range(3)]
    vw = [sum(R[c][j][:, None, :] * vl[j][:, :, None] for j in range(3))
          + tr[c][:, None, :] for c in range(3)]           # 3 x (B, V, T)
    nw = [sum(R[c][j][:, None, :] * nl[j][:, :, None] for j in range(3))
          for c in range(3)]                               # 3 x (B, P, T)
    dw = (model.planes[..., 3][:, :, None]
          - sum(nw[c] * tr[c][:, None, :] for c in range(3)))
    # disable padded plane slots: they must never win the face max
    pm = jnp.asarray(model.plane_mask)[:, :, None]
    dw = jnp.where(pm, dw, -1.0e30)
    nw = [jnp.where(pm, nwc, 0.0) for nwc in nw]

    # per-body spin / linear velocity / translation planes (physics.h:473)
    lmt = jnp.transpose(lin_b, (1, 2, 0))                  # (B, 3, T)
    amt = jnp.transpose(ang_b, (1, 2, 0))
    am = [amt[:, c] for c in range(3)]
    am_l = [sum(R[c][i] * am[c] for c in range(3)) for i in range(3)]
    iinv = model.tensorinv_massless * model.massinv[:, None, None]
    wloc = [sum(iinv[:, i, j][:, None] * am_l[j] for j in range(3))
            for i in range(3)]
    spin = [sum(R[c][i] * wloc[i] for i in range(3)) for c in range(3)]
    lv = [lmt[:, c] * model.massinv[:, None] for c in range(3)]
    aux = jnp.zeros((B, 16, T), jnp.float32)
    for c in range(3):
        aux = aux.at[:, c].set(spin[c]).at[:, 3 + c].set(lv[c]) \
                 .at[:, 6 + c].set(tr[c])
    aux = aux.at[:, 9].set(jnp.broadcast_to(
        jnp.asarray(model.radius)[:, None], (B, T)))  # circumscribed radius

    vw_f = jnp.concatenate([vwc.reshape(B * V, T) for vwc in vw], axis=0)
    nw_f = jnp.concatenate([nwc.reshape(B * P, T) for nwc in nw], axis=0)
    dw_f = dw.reshape(B * P, T)
    aux_f = aux.reshape(B * 16, T)
    scal = jnp.zeros(8, jnp.float32).at[0].set(params.driftmax)

    # HTS_CONTACT_UNROLL=1 unrolls the 87 pairs with static body slices —
    # measured as a Mosaic compile-time blowup (>25 min) for no shippable
    # win; the dynamic fori_loop is the default
    static_pairs = (tuple(tuple(int(v) for v in p) for p in pairs)
                    if os.environ.get("HTS_CONTACT_UNROLL", "0") == "1"
                    else None)
    out = _contact_fields_call(vw_f, nw_f, dw_f, aux_f,
                               jnp.asarray(pairs[:, 0], jnp.int32),
                               jnp.asarray(pairs[:, 1], jnp.int32), scal,
                               B, NP, n_points, refine_iters,
                               pairs=static_pairs)
    x = out.reshape(NP, NCH, n_points, T)
    n = [x[:, 9 + c, 0] for c in range(3)]                 # (NP, T)
    return (n, x[:, 0], x[:, 1],
            [x[:, 2 + c] for c in range(3)],
            [x[:, 5 + c] for c in range(3)],
            x[:, 8] > 0.5)


def kernel_supported(model) -> bool:
    """The kernel bakes the standard hull padding: every body 48 vert slots
    all valid, 96 plane slots (invalid ones disabled via the dw plane)."""
    import numpy as np
    return (model.verts.shape[1] == V and model.planes.shape[1] == P
            and bool(np.asarray(model.vert_mask).all()))
