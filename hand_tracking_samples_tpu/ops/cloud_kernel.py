"""Pallas TPU kernel: the whole cloud_from_depth pipeline for one track in
VMEM (PointCloud + takesubsample + compaction, misc_image.h:409-417 +
handtrack.h:679 semantics, same math as imaging.image_ops.cloud_from_depth).

The XLA formulation materialises ~2 GB of (rows, 128) / (slots, rows)
intermediates per 512-track frame-step (valid masks, two lane cumsums, the
slot->row one-hot, the picked rows); this kernel reads the 300 KB raw depth
raster per track and writes the (slots, 8) result.  Counting is exact f32
(every integer < 2^24); lane cumsums are 0/1-triangular bf16 matmuls
(integer sums <= 128) and the slot->(row, lane) picks are single-term bf16
one-hot contractions with the u16 depth split into two <=8-bit planes.

Bit-identical to imaging.image_ops.cloud_from_depth (asserted in
tests/test_cloud_kernel.py); that XLA path remains the non-TPU route.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(R: int, Rp: int, S: int, frac: int, W: int,
                 batched: bool = False):
    KW = -(-128 // max(frac, 1))     # max kept per row (every frac-th valid)
    KW = min(128, -(-KW // 8) * 8)   # sublane-aligned payload width
    pow2 = frac > 0 and (frac & (frac - 1)) == 0

    def kernel(draw_ref, scal_ref, out_ref):
        if batched:                  # (1, Rp, 128) blocks; scal whole (T, 8)
            t = pl.program_id(0)
            lo = scal_ref[t, 0]
            hi = scal_ref[t, 1]
            scale = scal_ref[t, 2]
            draw = draw_ref[0]
        else:
            lo = scal_ref[0]
            hi = scal_ref[1]
            scale = scal_ref[2]
            draw = draw_ref[:]                             # (Rp, 128) f32
        d = draw * scale
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (Rp, 128), 0)
        v = (d >= lo) & (d < hi) & (iota_r < R)            # (Rp, 128)

        ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        tri = (ii <= jj).astype(jnp.bfloat16)              # cumsum matmul

        def lane_cumsum(m):
            return jax.lax.dot_general(
                m.astype(jnp.bfloat16), tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)       # inclusive

        def row_cumsum_excl(col):
            # col (Rp, 1) f32 -> exclusive cumsum over rows via log rolls.
            # (A strictly-lower-triangular MXU matmul was measured SLOWER:
            # building the (Rp, Rp) tri + an M=Rp, N=1 HIGHEST dot costs
            # more than the ~log2(Rp) roll passes it saves.)
            cum = jnp.broadcast_to(col, (Rp, 128))
            k = 1
            while k < Rp:
                r = pltpu.roll(cum, k, axis=0)
                cum = cum + jnp.where(iota_r >= k, r, 0.0)
                k *= 2
            return cum[:, 0:1] - col                       # (Rp, 1)

        c_in = lane_cumsum(v)                              # (Rp, 128)
        row_base = row_cumsum_excl(c_in[:, 127:128])
        rank = row_base + c_in - 1.0
        kept = v & (jnp.floor(rank * (1.0 / frac)) * frac == rank)
        if pow2:
            # kept ranks are exactly the multiples of frac (the reciprocal-
            # multiply floor is exact for power-of-two frac), so the kept
            # counts are pure arithmetic on the VALID cumsum — no second
            # lane-cumsum matmul and no second log-roll row scan:
            #   #kept with rank < X  =  ceil(X / frac)
            inv = 1.0 / frac
            kbase = jnp.floor((row_base + (frac - 1.0)) * inv)   # (Rp, 1)
            k_in = jnp.floor((row_base + c_in + (frac - 1.0)) * inv) - kbase
            krow = k_in[:, 127:128]                        # (Rp, 1)
        else:
            k_in = lane_cumsum(kept)                       # (Rp, 128)
            krow = k_in[:, 127:128]                        # (Rp, 1)
            kbase = row_cumsum_excl(krow)                  # (Rp, 1)
        total = jnp.max(kbase + krow)

        # ---- per-row LEFT-COMPACTION of the kept points to KW lanes ----
        # Every row holds <= ceil(128/frac) kept points (kept is every
        # frac-th of the global valid rank, so any 128 consecutive ranks
        # contain at most that many).  Each kept element's in-row
        # destination is k_in-1; shift = lane - dest is NON-DECREASING along
        # the row, and routing a monotone compaction LSB-first over the
        # shift's bits is collision- and order-preserving at every stage
        # (positions stay dest + (shift with low bits cleared), strictly
        # increasing).  7 roll+select stages replace the (Rp, 3*128)-wide
        # slot-pick payload with a (Rp, KW)-wide one.
        iota_l128 = jax.lax.broadcasted_iota(jnp.int32, (Rp, 128), 1)
        # carriers packed two-wide: cv = draw*128 + lane (raw u16 depth and a
        # 7-bit lane index — <= 2^23-1, f32-exact), and the shift with the
        # kept flag encoded as sh >= 0 (dead lanes carry -1).  Halves the
        # per-stage rolls/selects vs separate (cz, cl, keep, sh) carriers.
        sh = jnp.where(kept,
                       iota_l128 - (k_in.astype(jnp.int32) - 1), -1)
        cv = jnp.where(kept, draw * 128.0 + iota_l128.astype(jnp.float32),
                       0.0)
        b = 1
        while b < 128:
            inc_sh = pltpu.roll(sh, 128 - b, axis=1)
            move_in = ((inc_sh >= 0) & ((inc_sh & b) != 0)
                       & (iota_l128 <= 127 - b))
            stay = (sh >= 0) & ((sh & b) == 0)
            cv = jnp.where(move_in, pltpu.roll(cv, 128 - b, axis=1),
                           jnp.where(stay, cv, 0.0))
            sh = jnp.where(move_in, inc_sh - b, jnp.where(stay, sh, -1))
            b *= 2
        cv = cv[:, 0:KW]                                   # (Rp, KW)
        cz = jnp.floor(cv * (1.0 / 128.0))                 # raw u16 depth
        cl = cv - cz * 128.0                               # lane index

        # slot -> kept-point index: identity while everything fits; when the
        # kept count exceeds the budget, sample the kept sequence uniformly
        # instead of truncating its tail (matches image_ops.cloud_from_depth
        # bit-for-bit; s*K < 2^31 so int32 is exact).  Everything from here
        # on is computed in SLOT-ROW layout ((1, S) / (KW, S)) so the kernel
        # emits channel-major planes with slots on lanes — no (S, small)
        # minor-dim tensors anywhere.
        Ki = total.astype(jnp.int32)
        iota_s1 = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        t_s = jnp.where(Ki > S, (iota_s1 * Ki) // S, iota_s1)  # (1, S)

        # slot -> row: the winner is the LAST row r with kbase[r] <= t(s),
        # i.e. kbase[r] <= t < kbase[r+1].  Mosaic cannot rotate i1 vectors,
        # so shift kbase (f32) instead of a mask.  No explicit r<R masks:
        # padded rows carry krow = 0, so their kbase equals `total` > t and
        # the compare kills them by value (the final wrapped row's le is
        # false for the same reason).  Compares run in int32 (counts are
        # exact ints).
        kbase_i = kbase.astype(jnp.int32)                  # (Rp, 1)
        kb_next = pltpu.roll(jnp.broadcast_to(kbase_i, (Rp, 128)),
                             Rp - 1, axis=0)[:, 0:1]       # kbase[r+1]
        # the roll wraps the last row's successor to kbase[0] = 0, which
        # would veto a winner in the final row — pin it to +inf (a (Rp, 1)
        # column op, not a wide mask)
        iota_ri = jax.lax.broadcasted_iota(jnp.int32, (Rp, 1), 0)
        kb_next = jnp.where(iota_ri == Rp - 1, jnp.int32(0x7fffffff),
                            kb_next)
        oh2 = ((kbase_i <= t_s) & (kb_next > t_s)).astype(jnp.bfloat16)

        # ONE pick matmul over the COMPACTED payload: the kept depths as two
        # <=8-bit planes (u16 exceeds bf16's exact-integer range), the kept
        # lane indices (<=127, bf16-exact), and the four (Rp, 1) scalar
        # columns.  Each output column is an independent single-term sum, so
        # this is bit-identical to separate picks.
        hi8 = jnp.floor(cz * (1.0 / 256.0))
        lo8 = cz - hi8 * 256.0
        kb_hi = jnp.floor(kbase * (1.0 / 256.0))
        kb_lo = kbase - kb_hi * 256.0
        iota_rc = jax.lax.broadcasted_iota(jnp.int32, (Rp, 1), 0).astype(jnp.float32)
        row_hi = jnp.floor(iota_rc * (1.0 / 256.0))
        row_lo = iota_rc - row_hi * 256.0
        stacked = jnp.concatenate(
            [hi8, lo8, cl, kb_hi, kb_lo, row_hi, row_lo],
            axis=1).astype(jnp.bfloat16)                   # (Rp, 3KW+4)
        picked_all = jax.lax.dot_general(
            stacked, oh2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # (3KW+4, S)
        hi_rows = picked_all[0:KW]                         # (KW, S)
        lo_rows = picked_all[KW:2 * KW]
        lane_rows = picked_all[2 * KW:3 * KW]
        kbase_s = (picked_all[3 * KW:3 * KW + 1] * 256.0
                   + picked_all[3 * KW + 1:3 * KW + 2])    # (1, S)
        row_s = (picked_all[3 * KW + 2:3 * KW + 3] * 256.0
                 + picked_all[3 * KW + 3:3 * KW + 4])

        iota_ss = t_s.astype(jnp.float32)                  # t(s), (1, S)
        j = iota_ss - kbase_s                              # (1, S) in [0,KW)
        iota_k = jax.lax.broadcasted_iota(
            jnp.int32, (KW, S), 0).astype(jnp.float32)
        sel = (iota_k == j).astype(jnp.float32)            # (KW, S)
        z = (jnp.sum(sel * hi_rows, axis=0, keepdims=True) * 256.0
             + jnp.sum(sel * lo_rows, axis=0, keepdims=True)) * scale
        lane = jnp.sum(sel * lane_rows, axis=0, keepdims=True)
        ok = (iota_ss < total).astype(jnp.float32)         # (1, S)
        flat = row_s * 128.0 + lane
        # true division (exact when the quotient is representable); a
        # reciprocal multiply mis-floors exact multiples of W
        py = jnp.floor(flat / W)
        px = flat - py * W
        res = jnp.concatenate(
            [px, py, z, ok, jnp.zeros((4, S), jnp.float32)], axis=0)
        if batched:
            out_ref[0] = res
        else:
            out_ref[:] = res

    return kernel


@functools.partial(jax.jit, static_argnames=("R", "frac", "budget", "W"))
def _cloud_call(draw, scal, R, frac, budget, W):
    from ..physics.pgs_kernel import _interpret
    Rp = draw.shape[0]
    kernel = _make_kernel(R, Rp, budget, frac, W)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, budget), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(draw, scal)


@functools.partial(jax.jit, static_argnames=("R", "frac", "budget", "W"))
def _cloud_call_batched(draw, scal, R, frac, budget, W):
    """draw (T, Rp, 128), scal (T, 8) -> (T, 8, budget).  Explicit parallel
    grid over tracks: vmap-of-pallas serializes the per-instance DMA against
    compute (measured 2x the cost of double-buffered parallel semantics)."""
    from ..physics.pgs_kernel import _interpret
    T, Rp = draw.shape[0], draw.shape[1]
    kernel = _make_kernel(R, Rp, budget, frac, W, batched=True)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        out_shape=jax.ShapeDtypeStruct((T, 8, budget), jnp.float32),
        in_specs=[pl.BlockSpec((1, Rp, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 8, budget), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(draw, scal)


_CLOUD_CV: dict = {}


def _get_cloud_cv(R: int, frac: int, budget: int, W: int):
    key = (R, frac, budget, W)
    if key in _CLOUD_CV:
        return _CLOUD_CV[key]
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(draw, scal):
        return _cloud_call(draw, scal, R, frac, budget, W)

    @f.def_vmap
    def f_vmap(axis_size, in_batched, draw, scal):
        T = axis_size
        db, sb = in_batched
        if not db:
            draw = jnp.broadcast_to(draw, (T,) + draw.shape)
        if not sb:
            scal = jnp.broadcast_to(scal, (T,) + scal.shape)
        out = _cloud_call_batched(draw, scal, R, frac, budget, W)
        return out, True

    _CLOUD_CV[key] = f
    return f


def cloud_from_depth_planes(depth, cam, range_lo, range_hi, frac: int,
                            budget: int):
    """Planes route of cloud_from_depth: returns ph (8, budget) f32 with rows
    [x, y, z, 1, mask, 0, 0, 0] — the channel-major layout every VMEM
    consumer (ops/cloud_rows.py) reads natively.  Values are bit-identical
    to cloud_from_depth's points; the (N, 3) contract pays a relayout copy
    per use on TPU (minor-dim-3 tiles), planes never do."""
    H, W = depth.shape
    assert (H * W) % 128 == 0
    R = (H * W) // 128
    Rp = -(-R // 8) * 8
    draw = depth.astype(jnp.float32).reshape(R, 128)
    draw = jnp.pad(draw, ((0, Rp - R), (0, 0)))
    scal = jnp.stack([jnp.float32(range_lo), jnp.float32(range_hi),
                      jnp.float32(cam.depth_scale),
                      jnp.float32(0), jnp.float32(0), jnp.float32(0),
                      jnp.float32(0), jnp.float32(0)])
    out = _get_cloud_cv(R, frac, budget, W)(draw, scal)   # (8, S) rows
    px, py, z, okf = out[0:1], out[1:2], out[2:3], out[3:4]
    # deprojectz row-wise — the same elementwise op sequence as
    # DCamera.deprojectz, so values match the (N, 2)-shaped call bit-for-bit
    x = (px - cam.principal[0]) / cam.focal[0] * z
    y = (py - cam.principal[1]) / cam.focal[1] * z
    return jnp.concatenate(
        [x, y, z, jnp.ones_like(x), okf,
         jnp.zeros((3, out.shape[1]), jnp.float32)], axis=0)


def planes_points(ph):
    """ph (8, N) -> (points (N, 3), mask (N,)) for the (N, 3) consumers."""
    return jnp.stack([ph[0], ph[1], ph[2]], axis=-1), ph[4] > 0.5


def cloud_from_depth_kernel(depth, cam, range_lo, range_hi, frac: int,
                            budget: int):
    """Kernel route of imaging.image_ops.cloud_from_depth; same signature,
    bit-identical output.  Requires (H*W) % 128 == 0."""
    ph = cloud_from_depth_planes(depth, cam, range_lo, range_hi, frac,
                                 budget)
    return planes_points(ph)
