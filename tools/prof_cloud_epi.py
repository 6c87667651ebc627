#!/usr/bin/env python
"""Bisect the cloud_from_depth epilogue cost: same kernel, different
consumption.  a) raw out sum  b) sliced column sums  c) full deprojectz.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                    DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.ops.cloud_kernel import _cloud_call

T = int(os.environ.get("PROF_TRACKS", "512"))
F = int(os.environ.get("PROF_FRAMES", "8"))
BUDGET = 2048


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

    def raw_out(d):
        H, W = d.shape
        R = (H * W) // 128
        draw = d.astype(jnp.float32).reshape(R, 128)
        scal = jnp.stack([jnp.float32(0.1), jnp.float32(0.7),
                          jnp.float32(cam.depth_scale)] + [jnp.float32(0)] * 5)
        return _cloud_call(draw, scal, R, 4, BUDGET, W)

    variants = {
        "raw_sum": lambda d: raw_out(d).sum(),
        "col_sums": lambda d: (lambda o: o[:, 0].sum() + o[:, 1].sum()
                               + o[:, 2].sum() + o[:, 3].sum())(raw_out(d)),
        "deproject": lambda d: (lambda o: cam.deprojectz(
            jnp.stack([o[:, 0], o[:, 1]], -1), o[:, 2]).sum()
            + (o[:, 3] > 0.5).sum())(raw_out(d)),
    }
    for name, fn in variants.items():
        def run(depths):
            def step(c, d):
                return c + jax.vmap(fn)(d), 0
            c, _ = jax.lax.scan(step, jnp.zeros(T), depths)
            return c
        f = jax.jit(run)
        out = jax.block_until_ready(f(depths))
        dts = []
        for _ in range(3):
            t0 = time.time()
            out = jax.block_until_ready(f(depths))
            dts.append(time.time() - t0)
        print(f"{name:10s}: {min(dts) / F * 1000:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
