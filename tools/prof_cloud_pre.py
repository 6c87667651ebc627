#!/usr/bin/env python
"""Does pre-converting depths to the kernel's (R, 128) f32 raster OUTSIDE
the scan kill the per-frame conversion+relayout cost?  Times the sum-only
kernel fed from (F, T, 600, 128) f32 carried through the scan."""
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
R = 600


def kernel(draw_ref, out_ref):
    out_ref[:] = jnp.broadcast_to(jnp.sum(draw_ref[:] * 0.001), (8, 128))


def call(draw):                        # draw (R, 128) f32
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(draw)


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

    def run_pre(depths):
        pre = depths.astype(jnp.float32).reshape(F, T, R, 128)
        def step(c, d):
            return c + jax.vmap(call)(d)[:, 0, 0], 0
        c, _ = jax.lax.scan(step, jnp.zeros(T), pre)
        return c

    def run_cur(depths):
        def step(c, d):
            draw = d.astype(jnp.float32).reshape(T, R, 128)
            return c + jax.vmap(call)(draw)[:, 0, 0], 0
        c, _ = jax.lax.scan(step, jnp.zeros(T), depths)
        return c

    for name, fn in (("preconv", run_pre), ("current", run_cur)):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(depths))
        dts = []
        for _ in range(3):
            t0 = time.time()
            out = jax.block_until_ready(f(depths))
            dts.append(time.time() - t0)
        print(f"{name}: {min(dts) / F * 1000:8.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
