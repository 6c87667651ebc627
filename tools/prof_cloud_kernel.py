#!/usr/bin/env python
"""Stage-cost attribution INSIDE ops/cloud_kernel.py (cloud_from_depth).

Times truncated variants of the kernel (each writes a junk-but-dependent
output so nothing dead-codes) at T tracks on the real chip:
  stage 1: load + valid + lane cumsum + row cumsum + rank/kept/k_in
  stage 2: + butterfly compaction
  stage 3: + oh2 slot->row one-hot + pick matmul
  stage 4: full kernel (epilogue selects + output)
Usage: PROF_TRACKS=512 python tools/prof_cloud_kernel.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                    DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.model.bake import load_hand_model

T = int(os.environ.get("PROF_TRACKS", "512"))
F = int(os.environ.get("PROF_FRAMES", "8"))
REPS = int(os.environ.get("PROF_REPS", "3"))
BUDGET = int(os.environ.get("PROF_BUDGET", "2048"))
FRAC = 4


def make_stage_kernel(R, Rp, S, frac, W, stage):
    KW = -(-128 // max(frac, 1))
    KW = min(128, -(-KW // 8) * 8)

    def kernel(draw_ref, scal_ref, out_ref):
        lo = scal_ref[0]
        hi = scal_ref[1]
        scale = scal_ref[2]
        draw = draw_ref[:]
        d = draw * scale
        if stage == 0:      # load + one reduction: DMA/launch/prep floor
            out_ref[:] = jnp.broadcast_to(jnp.sum(d), (S, 8))
            return
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (Rp, 128), 0)
        v = (d >= lo) & (d < hi) & (iota_r < R)
        ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        tri = (ii <= jj).astype(jnp.bfloat16)

        def lane_cumsum(m):
            return jax.lax.dot_general(
                m.astype(jnp.bfloat16), tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        def row_cumsum_excl(col):
            cum = jnp.broadcast_to(col, (Rp, 128))
            k = 1
            while k < Rp:
                r = pltpu.roll(cum, k, axis=0)
                cum = cum + jnp.where(iota_r >= k, r, 0.0)
                k *= 2
            return cum[:, 0:1] - col

        c_in = lane_cumsum(v)
        row_base = row_cumsum_excl(c_in[:, 127:128])
        rank = row_base + c_in - 1.0
        kept = v & (jnp.floor(rank * (1.0 / frac)) * frac == rank)
        inv = 1.0 / frac
        kbase = jnp.floor((row_base + (frac - 1.0)) * inv)
        k_in = jnp.floor((row_base + c_in + (frac - 1.0)) * inv) - kbase
        krow = k_in[:, 127:128]
        total = jnp.max(kbase + krow)
        if stage == 1:
            out_ref[:] = jnp.broadcast_to(
                total + jnp.sum(kept.astype(jnp.float32))
                + jnp.sum(k_in), (S, 8))
            return

        iota_l128 = jax.lax.broadcasted_iota(jnp.int32, (Rp, 128), 1)
        sh = jnp.where(kept, iota_l128 - (k_in.astype(jnp.int32) - 1), -1)
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
        cv = cv[:, 0:KW]
        cz = jnp.floor(cv * (1.0 / 128.0))
        cl = cv - cz * 128.0
        if stage == 2:
            out_ref[:] = jnp.broadcast_to(
                total + jnp.sum(cz) + jnp.sum(cl), (S, 8))
            return

        Ki = total.astype(jnp.int32)
        iota_s1 = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        t_s = jnp.where(Ki > S, (iota_s1 * Ki) // S, iota_s1)
        kbase_i = kbase.astype(jnp.int32)
        kb_next = pltpu.roll(jnp.broadcast_to(kbase_i, (Rp, 128)),
                             Rp - 1, axis=0)[:, 0:1]
        iota_ri = jax.lax.broadcasted_iota(jnp.int32, (Rp, 1), 0)
        kb_next = jnp.where(iota_ri == Rp - 1, jnp.int32(0x7fffffff),
                            kb_next)
        oh2 = ((kbase_i <= t_s) & (kb_next > t_s)).astype(jnp.bfloat16)
        hi8 = jnp.floor(cz * (1.0 / 256.0))
        lo8 = cz - hi8 * 256.0
        kb_hi = jnp.floor(kbase * (1.0 / 256.0))
        kb_lo = kbase - kb_hi * 256.0
        iota_rc = iota_ri.astype(jnp.float32)
        row_hi = jnp.floor(iota_rc * (1.0 / 256.0))
        row_lo = iota_rc - row_hi * 256.0
        stacked = jnp.concatenate(
            [hi8, lo8, cl, kb_hi, kb_lo, row_hi, row_lo],
            axis=1).astype(jnp.bfloat16)
        picked_all = jax.lax.dot_general(
            oh2, stacked, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        if stage == 3:
            out_ref[:] = jnp.broadcast_to(
                jnp.sum(picked_all[:, 0:1]), (S, 8))
            return
        hi_rows = picked_all[:, 0:KW]
        lo_rows = picked_all[:, KW:2 * KW]
        lane_rows = picked_all[:, 2 * KW:3 * KW]
        kbase_s = (picked_all[:, 3 * KW:3 * KW + 1] * 256.0
                   + picked_all[:, 3 * KW + 1:3 * KW + 2])
        row_s = (picked_all[:, 3 * KW + 2:3 * KW + 3] * 256.0
                 + picked_all[:, 3 * KW + 3:3 * KW + 4])
        iota_sc = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        iota_ss = jnp.where(Ki > S, (iota_sc * Ki) // S,
                            iota_sc).astype(jnp.float32)
        j = iota_ss - kbase_s
        iota_k = jax.lax.broadcasted_iota(
            jnp.int32, (S, KW), 1).astype(jnp.float32)
        sel = (iota_k == j).astype(jnp.float32)
        z = (jnp.sum(sel * hi_rows, axis=1, keepdims=True) * 256.0
             + jnp.sum(sel * lo_rows, axis=1, keepdims=True)) * scale
        lane = jnp.sum(sel * lane_rows, axis=1, keepdims=True)
        ok = (iota_ss < total).astype(jnp.float32)
        flat = row_s * 128.0 + lane
        py = jnp.floor(flat / W)
        px = flat - py * W
        out_ref[:] = jnp.concatenate(
            [px, py, z, ok, jnp.zeros((S, 4), jnp.float32)], axis=1)

    return kernel


def stage_call(depth, stage):
    H, W = depth.shape
    R = (H * W) // 128
    Rp = -(-R // 8) * 8
    draw = depth.astype(jnp.float32).reshape(R, 128)
    scal = jnp.stack([jnp.float32(0.1), jnp.float32(0.7),
                      jnp.float32(0.001)] + [jnp.float32(0)] * 5)
    kernel = make_stage_kernel(R, Rp, BUDGET, FRAC, W, stage)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BUDGET, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(draw, scal)


def main():
    model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    starts = (np.arange(T) * 37) % (len(bank) - F)
    fids = (starts[None, :] + np.arange(F)[:, None])
    poses = jnp.asarray(bank[fids])
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
    depths = jnp.stack([
        jnp.concatenate([render(poses[f, i:i + 256]) for i in range(0, T, 256)])
        for f in range(F)])
    depths.block_until_ready()

    from hand_tracking_samples_tpu.imaging.image_ops import cloud_from_depth

    which = ([int(a) for a in sys.argv[1:]] if len(sys.argv) > 1
             else [0, 1, 2, 3, 4, 5])
    for stage in which:
        def run(depths):
            def step(c, d):
                if stage == 5:   # the real path incl. deprojectz epilogue
                    vp, vm = jax.vmap(lambda dd: cloud_from_depth(
                        dd, cam, 0.1, 0.7, FRAC, BUDGET))(d)
                    return c + vp.sum(axis=(1, 2)) + vm.sum(axis=1), 0
                o = jax.vmap(lambda dd: stage_call(dd, stage))(d)
                return c + o[:, 0, 0], 0
            c, _ = jax.lax.scan(step, jnp.zeros(T), depths)
            return c
        f = jax.jit(run)
        out = jax.block_until_ready(f(depths))
        dts = []
        for _ in range(REPS):
            t0 = time.time()
            out = jax.block_until_ready(f(depths))
            dts.append(time.time() - t0)
        ms = min(dts) / F * 1000.0
        print(f"stage {stage}: {ms:8.2f} ms/frame ({T} tracks)", flush=True)


if __name__ == "__main__":
    main()
