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


def _make_kernel(R: int, Rp: int, S: int, frac: int, W: int):
    KW = -(-128 // max(frac, 1))     # max kept per row (every frac-th valid)
    KW = min(128, -(-KW // 8) * 8)   # sublane-aligned payload width

    def kernel(draw_ref, scal_ref, out_ref):
        lo = scal_ref[0]
        hi = scal_ref[1]
        scale = scal_ref[2]

        draw = draw_ref[:]                                 # (Rp, 128) f32
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
        k_in = lane_cumsum(kept)                           # (Rp, 128)
        krow = k_in[:, 127:128]                            # (Rp, 1)
        kbase = row_cumsum_excl(krow)                      # (Rp, 1)
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
        keep_i = kept.astype(jnp.int32)
        sh = jnp.where(kept, iota_l128 - (k_in.astype(jnp.int32) - 1), 0)
        cz = jnp.where(kept, draw, 0.0)                    # carried value
        cl = jnp.where(kept, iota_l128, 0)                 # carried lane idx
        b = 1
        while b < 128:
            inc_sh = pltpu.roll(sh, 128 - b, axis=1)
            inc_valid = pltpu.roll(keep_i, 128 - b, axis=1)
            move_in = ((inc_valid > 0) & ((inc_sh & b) != 0)
                       & (iota_l128 <= 127 - b))
            stay = (keep_i > 0) & ((sh & b) == 0)
            cz = jnp.where(move_in, pltpu.roll(cz, 128 - b, axis=1),
                           jnp.where(stay, cz, 0.0))
            cl = jnp.where(move_in, pltpu.roll(cl, 128 - b, axis=1),
                           jnp.where(stay, cl, 0))
            keep_new = jnp.where(move_in, 1, jnp.where(stay, keep_i, 0))
            sh = jnp.where(move_in, inc_sh - b, jnp.where(stay, sh, 0))
            keep_i = keep_new
            b *= 2
        cz = cz[:, 0:KW]                                   # (Rp, KW)
        cl = cl[:, 0:KW].astype(jnp.float32)

        # slot -> kept-point index: identity while everything fits; when the
        # kept count exceeds the budget, sample the kept sequence uniformly
        # instead of truncating its tail (matches image_ops.cloud_from_depth
        # bit-for-bit; s*K < 2^31 so int32 is exact)
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
            oh2, stacked, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)           # (S, 3KW+4)
        hi_rows = picked_all[:, 0:KW]                      # (S, KW)
        lo_rows = picked_all[:, KW:2 * KW]
        lane_rows = picked_all[:, 2 * KW:3 * KW]
        kbase_s = (picked_all[:, 3 * KW:3 * KW + 1] * 256.0
                   + picked_all[:, 3 * KW + 1:3 * KW + 2])
        row_s = (picked_all[:, 3 * KW + 2:3 * KW + 3] * 256.0
                 + picked_all[:, 3 * KW + 3:3 * KW + 4])

        iota_sc = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        iota_ss = jnp.where(Ki > S, (iota_sc * Ki) // S,
                            iota_sc).astype(jnp.float32)   # t(s), (S, 1)
        j = iota_ss - kbase_s                              # (S, 1) in [0,KW)
        iota_k = jax.lax.broadcasted_iota(
            jnp.int32, (S, KW), 1).astype(jnp.float32)
        sel = (iota_k == j).astype(jnp.float32)
        z = (jnp.sum(sel * hi_rows, axis=1, keepdims=True) * 256.0
             + jnp.sum(sel * lo_rows, axis=1, keepdims=True)) * scale
        lane = jnp.sum(sel * lane_rows, axis=1, keepdims=True)
        ok = (iota_ss < total).astype(jnp.float32)
        flat = row_s * 128.0 + lane
        # true division (exact when the quotient is representable); a
        # reciprocal multiply mis-floors exact multiples of W
        py = jnp.floor(flat / W)
        px = flat - py * W
        out_ref[:] = jnp.concatenate(
            [px, py, z, ok, jnp.zeros((S, 4), jnp.float32)], axis=1)

    return kernel


@functools.partial(jax.jit, static_argnames=("R", "frac", "budget", "W"))
def _cloud_call(draw, scal, R, frac, budget, W):
    from ..physics.pgs_kernel import _interpret
    Rp = draw.shape[0]
    kernel = _make_kernel(R, Rp, budget, frac, W)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((budget, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(draw, scal)


def cloud_from_depth_kernel(depth, cam, range_lo, range_hi, frac: int,
                            budget: int):
    """Kernel route of imaging.image_ops.cloud_from_depth; same signature,
    bit-identical output.  Requires (H*W) % 128 == 0."""
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
    out = _cloud_call(draw, scal, R, frac, budget, W)
    px, py, z, ok = out[:, 0], out[:, 1], out[:, 2], out[:, 3] > 0.5
    pts = cam.deprojectz(jnp.stack([px, py], -1), z)
    return pts, ok
