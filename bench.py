#!/usr/bin/env python
"""Benchmark: batched synthetic-sequence tracking, tracked frames/sec/chip.

BASELINE config 0 (synthetic-hand-tracker, dynamics-only fit) scaled the TPU
way: hundreds of independent tracks vmapped per chip, lax.scan over time.
The reference's real-time equivalent is 60 fps x 1 track on a desktop CPU
(dcam.h:264, handtrack.h:45); the north star is >=10,000 tracked fps/chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                     DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.parallel.tracks import (batched_tracker_state,
                                                       track_sequences)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params

MODEL_JSON = os.environ.get("HAND_MODEL_JSON",
                            DEFAULT_MODEL_JSON)
ANIMBANK = os.environ.get("ANIMBANK", DEFAULT_ANIMBANK)

N_TRACKS = int(os.environ.get("BENCH_TRACKS", "512"))
# 32 frames amortizes the axon tunnel's ~28 ms fixed dispatch cost so the
# metric measures steady-state throughput, not network RTT
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "32"))
POINT_BUDGET = int(os.environ.get("BENCH_POINT_BUDGET", "2048"))
SOLVER = os.environ.get("BENCH_SOLVER", "kernel")
CLOUD_ROWS = int(os.environ.get("BENCH_CLOUD_ROWS", "128"))


_RTT = None


def _tunnel_rtt():
    """Measured round-trip of a trivial dispatch+fetch.  Small-program
    timings over the axon tunnel are meaningless without subtracting it:
    block_until_ready can return before execution for small pure-XLA
    programs and identical (executable, inputs) pairs are served from a
    result cache, so honest micro-bench timing = one big in-jit scan over
    varying inputs, a VALUE fetch, minus this RTT."""
    global _RTT
    if _RTT is None:
        g = jax.jit(lambda b: b + 1.0)
        float(g(jnp.float32(0)))
        ts = []
        for i in range(3):
            t0 = time.time()
            float(g(jnp.float32(i + 10)))
            ts.append(time.time() - t0)
        _RTT = min(ts)
        sys.stderr.write(f"# tunnel rtt {_RTT*1000:.1f} ms\n")
    return _RTT


def _honest_dt(best):
    """RTT-subtracted rep time, refusing to report cache-served reps.  A rep
    at or below a few RTTs means the tunnel served the result cache (the
    round-2 inflation class) — raise so the bad number can't be committed
    instead of silently clamping to a floor that inflates the metric."""
    rtt = _tunnel_rtt()
    net = best - rtt
    if net < 3 * rtt:
        raise RuntimeError(
            f"micro-bench rep {best*1000:.1f} ms is within 3x the tunnel RTT "
            f"({rtt*1000:.1f} ms): result-cache or timing-jitter suspect — "
            f"grow the in-jit work (reps/batch) until reps dominate the RTT")
    return net


def emit(metric, value, baseline):
    print(json.dumps({"metric": metric, "value": round(value, 1),
                      "unit": ("frames/s/chip" if "fps" in metric or
                               "frames" in metric else "examples/s/chip"),
                      "vs_baseline": round(value / baseline, 2)}))


def bench_cnn_forward():
    """BASELINE config 2: trained net on 64x64 depth crops.

    The 20 forward passes ride ONE lax.scan over DIFFERENT batches inside a
    single jit call, and every rep biases the input: the axon tunnel
    result-caches identical (executable, inputs) executions AND a
    per-dispatch RTT dwarfs the op, so the naive loop-of-identical-calls
    measures the cache (~700x too good) or the network (~50x too bad)."""
    from hand_tracking_samples_tpu.assets_paths import DEFAULT_CNNB
    from hand_tracking_samples_tpu.cnn.model import forward, load_cnnb
    params = load_cnnb(DEFAULT_CNNB)
    B, R = 1024, 20
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(R, B, 64, 64).astype(np.float32))

    def run(params, x, b):
        def step(c, xb):
            return c + forward(params, xb + b).sum(), 0
        c, _ = jax.lax.scan(step, jnp.float32(0), x)
        return c

    f = jax.jit(run)
    float(f(params, x, jnp.float32(0)))
    dts = []
    for i in range(int(os.environ.get("BENCH_REPS", "3"))):
        t0 = time.time()
        float(f(params, x, jnp.float32(i + 1)))   # value fetch: the only
        dts.append(time.time() - t0)              # reliable sync (see below)
    # reference: single-example SSE forward at interactive rates (~60/s)
    emit("cnn_forward_crops_per_sec_per_chip",
         R * B / _honest_dt(min(dts)), 60.0)


def bench_train():
    """BASELINE config 4: forward+backward SGD examples/s (reference: 1
    example/step single-threaded, "hours... overnight")."""
    from hand_tracking_samples_tpu.cnn.model import init_params, sgd_step
    B, STEPS = 128, 200
    rng = np.random.RandomState(0)
    params = init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.rand(STEPS, B, 64, 64).astype(np.float32))
    t = jnp.asarray(rng.rand(STEPS, B, 2304).astype(np.float32))

    def run(params, x, t):
        def body(p, xt):
            p, mse = sgd_step(p, xt[0], xt[1], 0.001)
            return p, mse
        return jax.lax.scan(body, params, (x, t))

    f = jax.jit(lambda p, x, t, b: run(p, x + b, t)[1][-1])
    float(f(params, x, t, jnp.float32(0)))
    dts = []
    for i in range(int(os.environ.get("BENCH_REPS", "3"))):
        # per-rep input bias: identical (executable, inputs) executions are
        # served from the tunnel's result cache (measured ~700x too good)
        t0 = time.time()
        float(f(params, x, t, jnp.float32(i + 1)))
        dts.append(time.time() - t0)
    # reference ~ "hours overnight" for ~100k steps -> O(10) examples/s
    emit("train_sgd_examples_per_sec_per_chip",
         STEPS * B / _honest_dt(min(dts)), 10.0)


def bench_export(model, bank, cam):
    """BASELINE config 5: dataset-exporter throughput mode — segmentation +
    CNN-label rendering per frame, batched (PNG encoding is host IO and
    excluded; the reference's number includes it)."""
    from hand_tracking_samples_tpu.cnn.labels import gather_hand_expected
    from hand_tracking_samples_tpu.cnn.train import compress_frame
    T = 512
    ids = (np.arange(T) * 11) % len(bank)
    poses = jnp.asarray(bank[ids])
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
    depths = jnp.concatenate([render(poses[i:i + 256])
                              for i in range(0, T, 256)])
    def run(depths, poses, b):
        def step(c, i):
            # i varies per scan step so XLA cannot hoist the loop-invariant
            # body and compute the 5 iterations once
            out = jax.vmap(lambda d, p: compress_frame(d, cam, p))(
                depths + b + i, poses)
            return c + jax.tree.leaves(out)[0].astype(jnp.float32).sum(), 0
        c, _ = jax.lax.scan(step, jnp.float32(0),
                            jnp.arange(5, dtype=jnp.uint16))
        return c

    f = jax.jit(run)
    jax.block_until_ready(f(depths, poses, jnp.uint16(0)))
    dts = []
    for i in range(int(os.environ.get("BENCH_REPS", "3"))):
        # per-rep input bias busts the tunnel result cache (see cnn bench)
        t0 = time.time()
        out = jax.block_until_ready(f(depths, poses, jnp.uint16(i + 1)))
        dts.append(time.time() - t0)
    emit("export_segment_label_frames_per_sec_per_chip",
         5 * T / min(dts), 60.0)


def _recorded_depths(model, bank, cam, frame_ids):
    """BASELINE config 3 is 'recorded depth seqs': stream the depth frames
    from a DatasetWriter .rs recording of the animbank (the reference's
    file-replay mode, realtime-tracker.cpp:38 / dcam.h:345) instead of the
    in-memory render.  The recording is written once and cached; every
    benched frame then round-trips the real on-disk container through the
    C++ streaming loader."""
    from hand_tracking_samples_tpu.data.dataset import (DatasetInfo,
                                                        DatasetWriter,
                                                        load_dataset)
    cache = os.environ.get("BENCH_REC_CACHE", "/tmp/hts_bench_rec")
    bname = os.path.join(cache, f"animbank_{len(bank)}")
    if not os.path.exists(bname + ".rs"):
        os.makedirs(cache, exist_ok=True)
        render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
        frames = np.concatenate(
            [np.asarray(render(jnp.asarray(bank[i:i + 256])))
             for i in range(0, len(bank), 256)])
        info = DatasetInfo(dims=(320, 240), focal=(305, 305),
                           principal=(160, 120), depth_scale=0.001)
        with DatasetWriter(bname, info) as w:
            w.save_frames(frames, bank)
        sys.stderr.write(f"# wrote recording {bname}.rs "
                         f"({os.path.getsize(bname + '.rs') / 1e6:.0f} MB)\n")
    ds = load_dataset(bname)
    depths = np.asarray(ds.depth)                    # (F_total, H, W) uint16
    return jnp.asarray(depths[np.asarray(frame_ids)])  # (F, T, H, W)


def main():
    model = jtu.tree_map(jnp.asarray, load_hand_model(MODEL_JSON))
    bank = load_animbank(ANIMBANK)
    cam = synth_camera()
    mode = os.environ.get("BENCH_MODE", "dynamics")
    if mode == "cnn":
        return bench_cnn_forward()
    if mode == "train":
        return bench_train()
    if mode == "export":
        return bench_export(model, bank, cam)
    recorded = mode == "full_rec"
    full = mode == "full" or recorded
    config = TrackerConfig(point_budget=POINT_BUDGET, cnn_every_frame=full,
                           cnn_every_k=int(os.environ.get("BENCH_CNN_K", "1")),
                           solver=SOLVER, cloud_rows_per_body=CLOUD_ROWS,
                           use_pallas=os.environ.get("BENCH_PALLAS", "1") == "1",
                           contacts_mode=os.environ.get("BENCH_CONTACTS", "exact"),
                           # ablation knobs (stage cost attribution only —
                           # recorded numbers always use the defaults)
                           physics_iterations=int(
                               os.environ.get("BENCH_ITERS", "16")),
                           physics_iterations_post=int(
                               os.environ.get("BENCH_ITERS_POST", "4")),
                           physics_use_collision=int(
                               os.environ.get("BENCH_COLLISION", "1")),
                           boundary_planes=int(
                               os.environ.get("BENCH_BOUNDARY", "1")),
                           steps=int(os.environ.get("BENCH_STEPS", "5")),
                           steps_unibody=int(
                               os.environ.get("BENCH_UNIBODY", "3")))
    cnn_params = None
    if full:
        from hand_tracking_samples_tpu.assets_paths import DEFAULT_CNNB
        from hand_tracking_samples_tpu.cnn.model import load_cnnb
        cnn_params = load_cnnb(DEFAULT_CNNB)
    params = physics_params(config)

    # synthesize depth streams: each track replays the animbank from its own
    # start offset (independent sequences)
    starts = (np.arange(N_TRACKS) * 37) % (len(bank) - N_FRAMES)
    frame_ids = (starts[None, :] + np.arange(N_FRAMES)[:, None])  # (F, T)
    poses = jnp.asarray(bank[frame_ids])                          # (F, T, 17, 7)

    if recorded:
        depths = _recorded_depths(model, bank, cam, frame_ids)
    else:
        render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
        RCHUNK = 256  # ray-cast scan keeps a (chunk, pixels, planes) slab live
        depths = jnp.stack([
            jnp.concatenate([render(poses[f, i:i + RCHUNK])
                             for i in range(0, N_TRACKS, RCHUNK)])
            for f in range(N_FRAMES)])                            # (F,T,H,W)
    depths.block_until_ready()

    states = batched_tracker_state(model, N_TRACKS)
    # start at each track's ground-truth first pose
    states = states._replace(body=states.body._replace(pose=poses[0]))

    run = jax.jit(lambda s, d: track_sequences(s, model, cnn_params, d, cam,
                                               config, params))
    t0 = time.time()
    out_states, out_poses = run(states, depths)
    jax.block_until_ready(out_poses)
    compile_and_run = time.time() - t0

    # best of N reps: the tunnelled chip is time-shared and transient
    # congestion can inflate a single rep several-fold
    reps = []
    for _ in range(int(os.environ.get("BENCH_REPS", "3"))):
        t0 = time.time()
        out_states, out_poses = run(states, depths)
        jax.block_until_ready(out_poses)
        reps.append(time.time() - t0)
    dt = min(reps)

    frames = N_TRACKS * N_FRAMES
    fps = frames / dt

    # sanity: mean joint error vs ground truth on the last frame must stay
    # in the tracking regime (not diverged)
    err = float(jnp.linalg.norm(
        out_states.body.pose[:, :, :3] - poses[-1][:, :, :3], axis=-1).mean())

    # cloud-row drop accounting: rows lost to the per-body slot cap on the
    # final frame (reference semantics have no cap, physmodel.h:163-181)
    from hand_tracking_samples_tpu.imaging.image_ops import cloud_from_depth
    from hand_tracking_samples_tpu.fitting.cloud import closest_planes

    def drops(state, depth):
        pts, mask = cloud_from_depth(depth, cam, 0.1, config.drangey,
                                     config.subsample_fraction,
                                     config.point_budget)
        body, _, _ = closest_planes(state, model, pts, mask)
        cnt = jnp.zeros(17, jnp.int32).at[body].add(mask.astype(jnp.int32))
        return jnp.maximum(cnt - config.cloud_rows_per_body, 0).sum(), mask.sum()

    dr, tot = jax.jit(jax.vmap(lambda s, d: drops(s, d)))(
        out_states.body, depths[-1])
    drop_rate = float(dr.sum()) / max(float(tot.sum()), 1.0)
    sys.stderr.write(
        f"# cloud rows dropped by cloud_rows_per_body={CLOUD_ROWS} cap: "
        f"{float(dr.sum())/N_TRACKS:.1f}/track ({drop_rate*100:.1f}% of "
        f"points)\n")
    sys.stderr.write(
        f"# tracks={N_TRACKS} frames={N_FRAMES} warmup={compile_and_run:.1f}s "
        f"run={dt:.3f}s (reps {', '.join(f'{r:.3f}' for r in reps)}) "
        f"mean_joint_err={err*1000:.2f}mm devices={jax.devices()}\n"
        f"# (mean_joint_err is drift-vs-ground-truth of the geometric-only\n"
        f"#  fit after {N_FRAMES} frames on fast animbank segments; <=1mm\n"
        f"#  trajectory parity in the stable regime is asserted in\n"
        f"#  tests/test_tracker_e2e.py)\n")
    # measured reference comparison on the same protocol: the C++ tracker's
    # drift over the first 64 start offsets (tests/fixtures/fastdrift_ref.json,
    # golden_gen GG_FASTDRIFT — replaces the old asserted-not-measured
    # "reference drifts identically" note)
    fdp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tests", "fixtures", "fastdrift_ref.json")
    if N_TRACKS >= 64 and os.path.exists(fdp):
        fd = json.load(open(fdp))
        if N_FRAMES == fd["n_frames"]:
            e64 = float(jnp.linalg.norm(
                out_states.body.pose[:64, :, :3] - poses[-1][:64, :, :3],
                axis=-1).mean())
            ref64 = fd["mean_err_per_frame"][-1]
            sys.stderr.write(
                f"# fast-segment drift, first 64 tracks: ours "
                f"{e64*1000:.2f}mm vs C++ reference {ref64*1000:.2f}mm "
                f"(measured, identical protocol)\n")

    print(json.dumps({
        "metric": ("recorded_full_pipeline_tracked_fps_per_chip" if recorded
                   else "synthetic_full_pipeline_tracked_fps_per_chip" if full
                   else "synthetic_dynamics_tracked_fps_per_chip"),
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 60.0, 2),
    }))


if __name__ == "__main__":
    main()
