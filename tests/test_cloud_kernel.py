"""cloud_from_depth_kernel (interpret mode on CPU) must be bit-identical to
the XLA cloud_from_depth on rendered depth frames."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                    DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.imaging.image_ops import cloud_from_depth
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.ops.cloud_kernel import cloud_from_depth_kernel


def test_cloud_kernel_bit_identical(hand_model):
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    render = jax.jit(lambda p: fake_depth(p, hand_model, cam))
    # frac=4 is the shipped power-of-two path (arithmetic kept-counts);
    # frac=3 exercises the general two-cumsum fallback
    for i, frac in ((0, 4), (123, 4), (977, 4), (123, 3)):
        depth = render(jnp.asarray(bank[i]))
        pts_x, ok_x = jax.jit(lambda d: cloud_from_depth(
            d, cam, 0.1, 0.7, frac, 1024))(depth)
        pts_k, ok_k = jax.jit(lambda d: cloud_from_depth_kernel(
            d, cam, 0.1, 0.7, frac, 1024))(depth)
        np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_k))
        m = np.asarray(ok_x)
        np.testing.assert_array_equal(np.asarray(pts_x)[m],
                                      np.asarray(pts_k)[m])


def test_cloud_kernel_overflow_uniform(hand_model):
    """When the kept count exceeds the budget, both paths must take the SAME
    uniform subset (not a raster-order tail truncation): bit-identical, all
    slots valid, and the subset spans the full vertical extent of the
    unbudgeted cloud."""
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    depth = jax.jit(lambda p: fake_depth(p, hand_model, cam))(
        jnp.asarray(bank[123]))
    full, okf = jax.jit(lambda d: cloud_from_depth(
        d, cam, 0.1, 0.7, 4, 4096))(depth)
    n_kept = int(np.asarray(okf).sum())
    budget = 128
    assert n_kept > budget  # the overflow branch is really exercised
    pts_x, ok_x = jax.jit(lambda d: cloud_from_depth(
        d, cam, 0.1, 0.7, 4, budget))(depth)
    pts_k, ok_k = jax.jit(lambda d: cloud_from_depth_kernel(
        d, cam, 0.1, 0.7, 4, budget))(depth)
    np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_k))
    np.testing.assert_array_equal(np.asarray(pts_x)[np.asarray(ok_x)],
                                  np.asarray(pts_k)[np.asarray(ok_k)])
    assert np.asarray(ok_x).all()  # overflow fills every slot
    ys_f = np.asarray(full)[np.asarray(okf), 1]
    ys_b = np.asarray(pts_x)[np.asarray(ok_x), 1]
    # uniform subset reaches within a few points of both vertical extremes
    assert ys_b.min() < np.percentile(ys_f, 2)
    assert ys_b.max() > np.percentile(ys_f, 98)
