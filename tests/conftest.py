"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real chip (axon tunnel) is only for bench.py; per-op dispatch over the
tunnel is far too slow for unit tests, and sharding tests need 8 devices.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,  # noqa: E402
                                                     DEFAULT_MODEL_JSON)

MODEL_JSON = DEFAULT_MODEL_JSON


@pytest.fixture(scope="session")
def golden():
    import json
    with open(os.path.join(FIXTURES, "golden.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def hand_model():
    import jax.numpy as jnp
    from hand_tracking_samples_tpu.model.bake import load_hand_model
    m = load_hand_model(MODEL_JSON, cache_dir=os.path.join(FIXTURES, "cache"))
    return jax.tree_util.tree_map(jnp.asarray, m)


def quat_err(a, b):
    """Sign-invariant max quaternion component error."""
    a, b = np.asarray(a), np.asarray(b)
    sign = np.sign((a * b).sum(-1, keepdims=True))
    return np.abs(a - b * sign).max()


def cached_fake_depths(hand_model, poses, name):
    """Render fake-depth frames for (..., 17, 7) poses, cached as a
    compressed npz in fixtures/cache (CPU ray-casting the whole animbank
    protocol per test run would dominate the suite).  The cache key includes
    a content hash of the poses, so stale caches self-invalidate."""
    import hashlib
    import jax
    import jax.numpy as jnp
    from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
    poses = np.asarray(poses, np.float32)
    h = hashlib.sha1(poses.tobytes()).hexdigest()[:12]
    path = os.path.join(FIXTURES, "cache", f"depths_{name}_{h}.npz")
    if os.path.exists(path):
        return np.load(path)["depths"]
    cam = synth_camera()
    flat = poses.reshape(-1, 17, 7)
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, hand_model, cam)))
    out = []
    for i in range(0, flat.shape[0], 64):
        out.append(np.asarray(render(jnp.asarray(flat[i:i + 64]))))
    depths = np.concatenate(out).reshape(poses.shape[:-2] + (240, 320))
    np.savez_compressed(path, depths=depths.astype(np.uint16))
    return depths
