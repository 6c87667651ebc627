import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hand_tracking_samples_tpu.imaging.camera import DCamera
from hand_tracking_samples_tpu.imaging.heatmaps import (image_find_max,
                                                        peak_subpixel,
                                                        peak_volume, peaks_1d,
                                                        render_1d_heatmaps,
                                                        render_heatmap)
from hand_tracking_samples_tpu.imaging.image_ops import (distance_transform,
                                                         downsample_min,
                                                         point_cloud,
                                                         threshold)
from hand_tracking_samples_tpu.segment.handsegment import hand_segment_vr


@pytest.fixture(scope="module")
def synth_depth():
    """Same synthetic depth image as the golden generator."""
    depth = np.full((240, 320), 4000, np.uint16)
    yy, xx = np.mgrid[0:240, 0:320]
    d2 = (xx - 170.0) ** 2 + (yy - 120.0) ** 2
    m = d2 < 45 * 45
    depth[m] = (400 + d2[m] * 0.01).astype(np.uint16)
    arm = (np.abs(xx - 150) < 18) & (yy > 120)
    depth[arm] = 430
    return jnp.asarray(depth)


def test_heatmap_render_byte_exact(golden):
    hm = np.array(render_heatmap(jnp.asarray([7.3, 4.6]), (16, 16)))
    hm_g = np.array(golden["heatmap_7p3_4p6"]).reshape(16, 16)
    np.testing.assert_array_equal(hm, hm_g)


def test_heatmap_decode_golden(golden):
    hm = render_heatmap(jnp.asarray([7.3, 4.6]), (16, 16))
    fmap = hm.astype(jnp.float32) / 255.0
    mx = image_find_max(fmap)
    pk = peak_subpixel(fmap, mx)
    pv = peak_volume(fmap, pk)
    dec = np.array(golden["heatmap_decode"])
    np.testing.assert_allclose(np.array(mx), dec[:2])
    np.testing.assert_allclose(np.array(pk), dec[2:4], atol=1e-4)
    assert abs(float(pv) - dec[4]) < 1e-4


def test_heatmap_1d_byte_exact(golden):
    vm = np.array(render_1d_heatmaps(jnp.asarray([0.2, 0.55, 0.91]), 16))
    vm_g = np.array(golden["heatmap1d"]).reshape(3, 16)
    np.testing.assert_array_equal(vm, vm_g)


def test_peaks_1d_roundtrip():
    vals = jnp.asarray([0.13, 0.5, 0.77, 0.31])
    img = render_1d_heatmaps(vals, 16).astype(jnp.float32)
    out = peaks_1d(img)
    np.testing.assert_allclose(np.array(out), np.array(vals), atol=0.02)


def test_distance_transform_golden(golden, synth_depth):
    small = downsample_min(downsample_min(synth_depth))
    dt = distance_transform(threshold(small, hi=jnp.uint16(700)))
    dt_g = np.array(golden["segment_dt"]).reshape(60, 80)
    np.testing.assert_array_equal(np.array(dt), dt_g)


def test_hand_segment_golden(golden, synth_depth):
    cam = DCamera.make((320, 240))  # Image(int2) ctor intrinsics
    seg = jax.jit(lambda d: hand_segment_vr(d, cam, 0xF, (0.1, 0.7), 0.17))(synth_depth)
    seg_g = np.array(golden["segment_raster"]).reshape(64, 64)
    mine = np.array(seg.depth)
    # allow a couple of boundary pixels to differ by 1 unit (rounding at the
    # resample edge); everything else byte-exact
    ndiff = (mine != seg_g).sum()
    assert ndiff <= 4, ndiff
    assert np.abs(mine.astype(int) - seg_g).max() <= 1
    cam_g = np.array(golden["segment_cam"])
    np.testing.assert_allclose(np.array(seg.cam.focal), cam_g[2:4], rtol=1e-5)
    np.testing.assert_allclose(np.array(seg.cam.pose[3:]), cam_g[6:], atol=1e-5)


def test_point_cloud_mask(synth_depth):
    cam = DCamera.make((320, 240))
    pts, mask = point_cloud(synth_depth, cam, 0.1, 0.7)
    assert pts.shape == (240 * 320, 3)
    # hand pixels are within range; background 4m is not
    assert 2000 < int(mask.sum()) < 12000
    z = np.array(pts[..., 2])[np.array(mask)]
    assert (z >= 0.1).all() and (z < 0.7).all()
