"""CNN training pipeline: batched data-parallel SGD on segmented depth crops.

Replicates the train-hand-pose-cnn semantics (train-cnn.cpp:31-50, 124-170):
  * compress: segment each recorded frame to the 64x64 crop, reproject the
    ground-truth poses into the segment camera frame, zero the camera pose
  * labels: GatherHandExpectedCNN against the 16x16 sub-camera
  * even frames train, odd frames are the held-out test set
  * SGD with alpha=0.001 on the softmax-MSE loss (see cnn/model.py)

The reference trains one example per step on one CPU core ("hours...
overnight", train-hand-pose-cnn/readme.md:18).  Here the step is batched
(vmap over the batch hits the MXU) and optionally sharded over a device mesh
(data parallel; the 9.4M-parameter net needs no model parallelism).

Also provides a synthetic-data path: render animbank poses with the
ray-caster and train on those — this is how the checked-in weights were
produced, since the reference repo ships no .cnnb.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..data.synth import fake_depth, synth_camera
from ..imaging.camera import DCamera
from ..maths.pose import pose_inverse, pose_mul
from ..segment.handsegment import cnn_input_from_segment, hand_segment_vr
from .labels import gather_hand_expected
from .model import forward, sgd_step


class TrainingSet(NamedTuple):
    """Compressed frames ready for training."""
    inputs: jnp.ndarray    # (F, 64, 64) float32 in [0,1]
    labels: jnp.ndarray    # (F, 2304) float32
    poses: jnp.ndarray     # (F, 17, 7) segment-frame poses


def compress_frame(depth, cam: DCamera, pose, drange=(0.1, 0.70)):
    """train-cnn.cpp:31-50 compress + label generation for one frame."""
    seg = hand_segment_vr(depth, cam, 0xF, drange, 0.17)
    inv = pose_inverse(seg.cam.pose)
    pose_seg = jax.vmap(lambda p: pose_mul(inv, p))(pose)
    x = cnn_input_from_segment(seg.depth, cam.depth_scale, drange)
    seg_cam = seg.cam._replace(pose=jnp.zeros(7).at[6].set(1.0))
    hcam = seg_cam.sub(4)
    labels, _, _ = gather_hand_expected(pose_seg, hcam)
    return x, labels, pose_seg


def compress_dataset(depth_frames, cam: DCamera, poses,
                     drange=(0.1, 0.70), chunk: int = 64) -> TrainingSet:
    """Batched compress over a recording. depth (F,H,W) uint16."""
    fn = jax.jit(jax.vmap(lambda d, p: compress_frame(d, cam, p, drange)))
    xs, ls, ps = [], [], []
    for i in range(0, len(depth_frames), chunk):
        x, l, p = fn(jnp.asarray(depth_frames[i:i + chunk]),
                     jnp.asarray(poses[i:i + chunk]))
        xs.append(x)
        ls.append(l)
        ps.append(p)
    return TrainingSet(jnp.concatenate(xs), jnp.concatenate(ls),
                       jnp.concatenate(ps))


def _augment_poses(poses, key):
    """Random global rigid transform keeping the hand in view: small rotation
    about the camera axis-ish directions + translation within the frustum.
    Expands the synthetic set beyond the animbank's recorded viewpoints."""
    from ..maths.pose import pose_mul
    from ..maths.quat import quat_from_axis_angle
    k1, k2, k3 = jax.random.split(key, 3)
    axis = jax.random.normal(k1, (3,))
    axis = axis / jnp.linalg.norm(axis)
    angle = jax.random.uniform(k2, (), minval=-0.5, maxval=0.5)
    dq = quat_from_axis_angle(axis, angle)
    dt = jax.random.uniform(k3, (3,), minval=-1.0, maxval=1.0) \
        * jnp.asarray([0.06, 0.05, 0.08])
    # rotate about the palm's current position so the hand stays in frame
    pivot = poses[1, :3]
    dp = jnp.concatenate([pivot + dt, dq])
    un_pivot = jnp.concatenate([-pivot, jnp.asarray([0.0, 0, 0, 1])])
    world = pose_mul(dp, un_pivot)
    return jax.vmap(lambda p: pose_mul(world, p))(poses)


def synthetic_training_set(model, bank, frame_ids, cam: DCamera | None = None,
                           chunk: int = 64, augment: bool = False,
                           seed: int = 0) -> TrainingSet:
    """Render animbank poses to depth and compress — unlimited labelled data
    with exact ground truth (the synthetic-hand-tracker flywheel, done
    offline)."""
    if cam is None:
        cam = synth_camera()
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
    fn = jax.jit(jax.vmap(lambda d, p: compress_frame(d, cam, p)))
    aug = jax.jit(jax.vmap(_augment_poses))
    xs, ls, ps = [], [], []
    ids = np.asarray(frame_ids)
    for i in range(0, len(ids), chunk):
        poses = jnp.asarray(bank[ids[i:i + chunk]])
        if augment:
            keys = jax.random.split(jax.random.PRNGKey(seed + i), len(poses))
            poses = aug(poses, keys)
        depth = render(poses)
        x, l, p = fn(depth, poses)
        xs.append(x)
        ls.append(l)
        ps.append(p)
    return TrainingSet(jnp.concatenate(xs), jnp.concatenate(ls),
                       jnp.concatenate(ps))


def train_epoch(params, data: TrainingSet, rng: np.random.RandomState,
                steps: int, batch_size: int = 64, alpha: float = 0.001,
                train_split: str = "even"):
    """Random-even-frame batches (train-cnn.cpp:143).  Returns
    (params, mean mse over the epoch)."""
    n = data.inputs.shape[0]
    pool = np.arange(0, n, 2) if train_split == "even" else np.arange(n)
    step = jax.jit(sgd_step, static_argnames=())
    mses = []
    for _ in range(steps):
        idx = rng.choice(pool, batch_size)
        params, mse = step(params, data.inputs[idx], data.labels[idx], alpha)
        mses.append(float(mse))
    return params, float(np.mean(mses))


def train_epoch_scanned(params, data: TrainingSet, rng: np.random.RandomState,
                        steps: int, batch_size: int = 64,
                        alpha: float = 0.001, train_split: str = "even"):
    """Same semantics as train_epoch, but the whole epoch runs as ONE
    lax.scan on-device over pre-sampled batch indices — essential on the
    tunnelled TPU where each dispatch costs more than the step itself."""
    n = data.inputs.shape[0]
    pool = np.arange(0, n, 2) if train_split == "even" else np.arange(n)
    idx = jnp.asarray(rng.choice(pool, (steps, batch_size)))

    def body(params, ix):
        params, mse = sgd_step(params, data.inputs[ix], data.labels[ix],
                               alpha)
        return params, mse

    params, mses = jax.lax.scan(body, params, idx)
    return params, float(jnp.mean(mses))


def evaluate(params, data: TrainingSet, split: str = "odd",
             batch_size: int = 256):
    """Held-out mse + mean landmark pixel error on the 16x16 heatmaps."""
    n = data.inputs.shape[0]
    idx = np.arange(1, n, 2) if split == "odd" else np.arange(n)
    fwd = jax.jit(forward)
    total, count = 0.0, 0
    for i in range(0, len(idx), batch_size):
        b = idx[i:i + batch_size]
        y = fwd(params, data.inputs[b])
        e = y - data.labels[b]
        total += float(jnp.sum(jnp.mean(e * e, axis=-1)))
        count += len(b)
    return total / max(count, 1)
