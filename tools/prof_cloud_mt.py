#!/usr/bin/env python
"""Is the cloud kernel's stage-0 floor per-instance overhead?  Time a
sum-only kernel at 1/2/4/8/16 tracks per grid instance (same total work).
Usage: python tools/prof_cloud_mt.py
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
REPS = 3
R = 600


def bench(depths, trk):
    G = T // trk
    RT = trk * R

    def kernel(draw_ref, out_ref):
        out_ref[:] = jnp.broadcast_to(jnp.sum(draw_ref[:] * 0.001),
                                      (1, 8, 128))

    def call(d):                       # d (T, H, W) u16
        draw = d.astype(jnp.float32).reshape(G, RT, 128)
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((1, RT, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        )(draw)

    def run(depths):
        def step(c, d):
            return c + call(d)[:, 0, 0], 0
        c, _ = jax.lax.scan(step, jnp.zeros(G), depths)
        return c

    f = jax.jit(run)
    out = jax.block_until_ready(f(depths))
    dts = []
    for _ in range(REPS):
        t0 = time.time()
        out = jax.block_until_ready(f(depths))
        dts.append(time.time() - t0)
    print(f"tracks/instance {trk:3d}: {min(dts) / F * 1000:8.2f} ms/frame",
          flush=True)


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
    for trk in (1, 2, 4, 8, 16):
        bench(depths, trk)


if __name__ == "__main__":
    main()
