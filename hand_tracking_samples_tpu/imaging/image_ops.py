"""Image-pyramid / depth-image operations (include/misc_image.h) as jnp ops.

Images are plain (H, W) arrays (row-major, y-down like the reference raster);
the camera travels separately as a DCamera.  The Manhattan distance transform
— a sequential two-pass raster scan in the reference (misc_image.h:183-195) —
is reformulated as per-row running min-plus scans (cummin of a[k]-k) inside a
lax.scan over rows, which is exactly equivalent.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .camera import DCamera


def downsample_min(img):
    h, w = img.shape
    x = img.reshape(h // 2, 2, w // 2, 2)
    return x.min(axis=(1, 3))


def downsample_max(img):
    h, w = img.shape
    return img.reshape(h // 2, 2, w // 2, 2).max(axis=(1, 3))


def downsample_avg(img):
    """DownSampleAvg (misc_image.h:91): pairwise (a+b)/2 in the source dtype,
    i.e. integer division for integer rasters, applied as f(f(a,b),f(c,d))."""
    h, w = img.shape
    x = img.reshape(h // 2, 2, w // 2, 2)
    ab = (x[:, 0, :, 0] + x[:, 0, :, 1]) // 2 if jnp.issubdtype(img.dtype, jnp.integer) \
        else (x[:, 0, :, 0] + x[:, 0, :, 1]) / 2
    cd = (x[:, 1, :, 0] + x[:, 1, :, 1]) // 2 if jnp.issubdtype(img.dtype, jnp.integer) \
        else (x[:, 1, :, 0] + x[:, 1, :, 1]) / 2
    return (ab + cd) // 2 if jnp.issubdtype(img.dtype, jnp.integer) else (ab + cd) / 2


def downsample_fst(img):
    return img[::2, ::2]


def upsample(img):
    return jnp.repeat(jnp.repeat(img, 2, axis=0), 2, axis=1)


def _minplus_row(row):
    """r[x] = min_k<=x (row[k] + (x-k)) via cummin(row[k]-k) + x."""
    n = row.shape[-1]
    idx = jnp.arange(n, dtype=row.dtype)
    m = jax.lax.associative_scan(jnp.minimum, row - idx, axis=-1)
    return m + idx


def _minplus_row_rev(row):
    """r[x] = min_{k>=x} (row[k] + (k-x)) = suffix_cummin(row[k]+k) - x."""
    n = row.shape[-1]
    idx = jnp.arange(n, dtype=row.dtype)
    b = row + idx
    sfx = jax.lax.associative_scan(jnp.minimum, b[..., ::-1], axis=-1)[..., ::-1]
    return sfx - idx


def distance_transform(binary255):
    """misc_image.h:183-195: Manhattan distance transform of a 0/255 mask,
    clamped to 255.

    The reference's forward+backward raster passes compute the exact
    city-block distance to the nearest 0 pixel (Rosenfeld-Pfaltz); the L1
    metric is separable, so the same result is two 1-D min-plus convolutions
    with the |delta| kernel (each = min of a forward and a backward cummin),
    log-depth associative scans instead of a row-sequential lax.scan."""
    img = binary255.astype(jnp.int32)
    col = jnp.minimum(_minplus_row(img.T), _minplus_row_rev(img.T)).T
    out = jnp.minimum(_minplus_row(col), _minplus_row_rev(col))
    return jnp.minimum(out, 255).astype(jnp.uint8)


def threshold(depth, lo=None, hi=None):
    """Threshold (misc_image.h:179): predicate -> 0/255 mask."""
    m = jnp.ones_like(depth, bool)
    if lo is not None:
        m &= depth >= lo
    if hi is not None:
        m &= depth < hi
    return jnp.where(m, jnp.uint8(255), jnp.uint8(0))


def sample(src, src_cam: DCamera, dst_cam: DCamera, background=0):
    """Sample (misc_image.h:143-150): plain point-resample under a new camera
    (no depth-plane correction) — used for IR/greyscale channels."""
    W, H = dst_cam.dim
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    from ..maths.pose import pose_apply
    rays = dst_cam.deprojectz(jnp.stack([xs, ys], -1), jnp.ones((H, W)))
    pp = src_cam.projectz(pose_apply(dst_cam.pose, rays))
    ppi = pp.astype(jnp.int32)
    sw, sh = src_cam.dim
    inside = ((ppi[..., 0] >= 0) & (ppi[..., 0] <= sw - 1)
              & (ppi[..., 1] >= 0) & (ppi[..., 1] <= sh - 1))
    ppc = jnp.clip(ppi, 0, jnp.asarray([sw - 1, sh - 1]))
    return jnp.where(inside, src[ppc[..., 1], ppc[..., 0]],
                     jnp.asarray(background, src.dtype))


def gather_pixels_u16(img, r, c):
    """img (H,W) uint16, r/c (K,) int32 clipped row/col indices -> (K,) f32
    pixel values.  One-hot MXU row pick, exact in bf16 by splitting u16 into
    two <=8-bit planes (single-term sums); a K-point gather on TPU costs
    orders of magnitude more than these two matmuls."""
    H, W = img.shape
    oh = (r[:, None] == jnp.arange(H, dtype=jnp.int32)[None, :]
          ).astype(jnp.bfloat16)                          # (K, H)
    srcf = img.astype(jnp.float32)
    hi8 = jnp.floor(srcf * (1.0 / 256.0))
    lo8 = srcf - hi8 * 256.0
    picked = (jnp.dot(oh, hi8.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) * 256.0
              + jnp.dot(oh, lo8.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32))  # (K, W)
    lanes = jnp.arange(W, dtype=jnp.int32)
    return jnp.sum(jnp.where(c[:, None] == lanes[None, :], picked, 0.0),
                   axis=1)


def sample_d(src, src_cam: DCamera, dst_cam: DCamera, background):
    """SampleD (misc_image.h:154-162): point-resample a depth image under a
    new camera, correcting sampled depth to the destination image plane."""
    W, H = dst_cam.dim
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    p = jnp.stack([xs, ys], axis=-1)                      # (H,W,2)
    from ..maths.pose import pose_apply
    rays = dst_cam.deprojectz(p, jnp.ones((H, W), jnp.float32))
    world = pose_apply(dst_cam.pose, rays)
    pp = src_cam.projectz(world)
    ppi = pp.astype(jnp.int32)                            # C-cast truncation
    sw, sh = src_cam.dim
    inside = ((ppi[..., 0] >= 0) & (ppi[..., 0] <= sw - 1)
              & (ppi[..., 1] >= 0) & (ppi[..., 1] <= sh - 1))
    ppc = jnp.clip(ppi, 0, jnp.asarray([sw - 1, sh - 1]))
    if src.dtype == jnp.uint16 and H * W <= 8192:
        # the (H*W)-pixel gather costs ~30 ms at T=512 on TPU
        sampled = gather_pixels_u16(
            src, ppc[..., 1].reshape(-1),
            ppc[..., 0].reshape(-1)).reshape(H, W).astype(src.dtype)
    else:
        sampled = src[ppc[..., 1], ppc[..., 0]]
    ppdir = pose_apply(dst_cam.pose, dst_cam.deprojectz(dst_cam.principal,
                                                        jnp.float32(1.0)))
    deproj = src_cam.deprojectz(ppi.astype(jnp.float32),
                                sampled.astype(jnp.float32))
    corrected = jnp.sum(ppdir * deproj, axis=-1)
    out = jnp.where(inside, corrected.astype(src.dtype),
                    jnp.asarray(background, src.dtype))
    return out


def point_cloud(depth, cam: DCamera, range_lo, range_hi, stride: int = 1):
    """PointCloud (misc_image.h:409-417) with a validity mask instead of a
    dynamic list. Optional pixel stride implements takesubsample's every-Nth
    selection in a shape-static way. Returns points (N,3), mask (N,)."""
    d = depth[::stride, ::stride].astype(jnp.float32) * cam.depth_scale
    h, w = d.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) * stride,
                          jnp.arange(w, dtype=jnp.float32) * stride,
                          indexing="ij")
    pts = cam.deprojectz(jnp.stack([xs, ys], -1), d)
    mask = (d >= range_lo) & (d < range_hi)
    return pts.reshape(-1, 3), mask.reshape(-1)


def depth_mesh(depth, cam: DCamera, range_lo, range_hi, gaplimit=jnp.inf,
               skip: int = 1):
    """DepthMesh (misc_image.h:419-451) with static shapes: one vertex per
    (skip x skip) cell (the cell's top-left in-range pixel in the reference;
    here the cell representative), quads triangulated where all corners are
    valid and depth gaps stay under `gaplimit`.  Returns (verts (H*W,3),
    vert_mask, tris (2*(H-1)*(W-1),3), tri_mask)."""
    d = depth[::skip, ::skip].astype(jnp.float32) * cam.depth_scale
    h, w = d.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) * skip,
                          jnp.arange(w, dtype=jnp.float32) * skip,
                          indexing="ij")
    verts = cam.deprojectz(jnp.stack([xs, ys], -1), d).reshape(-1, 3)
    valid = ((d >= range_lo) & (d < range_hi))
    vid = jnp.arange(h * w).reshape(h, w)
    a = vid[:-1, :-1].reshape(-1)
    b = vid[1:, :-1].reshape(-1)
    c = vid[1:, 1:].reshape(-1)
    e = vid[:-1, 1:].reshape(-1)
    vflat = valid.reshape(-1)
    z = verts[:, 2]

    def ok(i, j):
        return vflat[i] & vflat[j] & (jnp.abs(z[i] - z[j]) <= gaplimit)

    t1 = jnp.stack([a, b, c], -1)
    t2 = jnp.stack([c, e, a], -1)
    m1 = ok(a, b) & ok(b, c) & ok(c, a)
    m2 = ok(c, e) & ok(e, a) & ok(a, c)
    tris = jnp.concatenate([t1, t2])
    tmask = jnp.concatenate([m1, m2])
    return verts, vflat, tris.astype(jnp.int32), tmask


def image_clip(depth, cam: DCamera, plane, val):
    """ImageClip (misc_image.h:454-460): set pixels under `plane` to val."""
    h, w = depth.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    pts = cam.deprojectz(jnp.stack([xs, ys], -1),
                         depth.astype(jnp.float32) * cam.depth_scale)
    d = pts @ plane[:3] + plane[3]
    return jnp.where(d < 0, jnp.asarray(val, depth.dtype), depth)


def plane_split_masks(points, plane, epsilon: float = 0.02):
    """PlaneSplit (misc_image.h:462-473) as masks: (under, coplanar, over)."""
    pd = points @ plane[:3] + plane[3]
    return pd <= -epsilon, (pd > -epsilon) & (pd <= epsilon), pd > epsilon


def mirror_points(points, plane):
    """Mirror (misc_image.h:474-479): reflect points across `plane`."""
    pd = points @ plane[:3] + plane[3]
    return points - plane[:3][None, :] * (2.0 * pd)[:, None]


def mirror_plane_split(points, mask, plane, epsilon: float = 0.02):
    """MirrorPlaneSplit (misc_image.h:480-485): points under the mirror plane
    are reflected back into the scene; returns (points, mask) with the
    coplanar band removed — used for DS4 mirror rigs (SURVEY C13)."""
    under, coplanar, over = plane_split_masks(points, plane, epsilon)
    pts = jnp.where(under[:, None], mirror_points(points, plane), points)
    return pts, mask & ~coplanar


def voxel_subsample(points, mask, voxel_size: float = 0.01,
                    min_voxel_num: int = 1, n_buckets: int = 2048):
    """voxelsubsample (physmodel.h:66-118): spatially-uniform downsample by
    averaging points per voxel, via the same multiplicative hash into
    n_buckets buckets.  TPU delta: hash collisions merge instead of linear-
    probing (rare at hand point counts; the reference also merges on bucket
    exhaustion).  Returns (points (n_buckets,3), mask)."""
    coeff = jnp.asarray([54851, 11909, 24781], jnp.uint32)  # physmodel.h:83
    ipos = jnp.floor(points / voxel_size).astype(jnp.int32).astype(jnp.uint32)
    h = (ipos * coeff[None, :]).sum(axis=1) & jnp.uint32(n_buckets - 1)
    h = h.astype(jnp.int32)
    w = mask.astype(jnp.float32)
    sums = jnp.zeros((n_buckets, 3), jnp.float32).at[h].add(points * w[:, None])
    cnts = jnp.zeros((n_buckets,), jnp.float32).at[h].add(w)
    out_mask = cnts >= min_voxel_num
    out = sums / jnp.maximum(cnts, 1.0)[:, None]
    return out, out_mask


def compact_points(points, mask, budget: int):
    """Pack the valid points to the front, fixed budget. Points beyond the
    budget are dropped (the reference keeps all; the budget is the TPU
    static-shape tradeoff — size it generously).  Stable argsort of the
    validity key — measured faster end-to-end than a prefix-sum scatter
    (docs/PERFORMANCE.md); for depth images use cloud_from_depth instead."""
    order = jnp.argsort(~mask, stable=True)  # valid first, original order
    pts = points[order[:budget]]
    msk = mask[order[:budget]]
    return pts, msk


def cloud_from_depth_planes(depth, cam: DCamera, range_lo, range_hi,
                            frac: int, budget: int):
    """cloud_from_depth in the channel-major planes carrier: ph (8, budget)
    f32 with rows [x, y, z, 1, mask, 0, 0, 0].  On TPU this is the kernel's
    NATIVE output layout (slots on lanes) — the (N, 3) contract pays a
    minor-dim-3 relayout copy at every producer/consumer boundary, planes
    never do.  Values are bit-identical to cloud_from_depth."""
    if (jax.default_backend() == "tpu" and budget % 8 == 0
            and (depth.shape[0] * depth.shape[1]) % 128 == 0):
        from ..ops.cloud_kernel import cloud_from_depth_planes as k
        return k(depth, cam, range_lo, range_hi, frac, budget)
    pts, ok = cloud_from_depth(depth, cam, range_lo, range_hi, frac, budget)
    from ..ops.cloud_rows import points_planes
    return points_planes(pts, ok)


def compact_planes(ph, keep, budget: int):
    """compact_points on the planes carrier: kept lanes (keep (N,) bool) are
    packed to the front of a (8, budget) planes block in original order,
    mask row = slot validity, empty slots zero.  The pack is ONE one-hot
    f32 matmul (single-term sums — exact); identical valid entries to
    compact_points(points, keep, budget).

    Drop semantics (mirrors compact_points): kept lanes whose rank >= budget
    are TAIL-dropped — their one-hot column does not exist.  This violates
    the no-tail-truncate invariant unless the caller sizes budget >= the
    maximum possible keep count (multi_step_sim does: msub_budget equals the
    exact subsample maximum) or pre-thins `keep` uniformly first."""
    if __debug__ and os.environ.get("HTS_DEBUG_CAPS", "0") == "1":
        # opt-in runtime guard for future call sites (constant-folds away
        # under jit otherwise): assert the budget can hold every kept lane
        jax.debug.callback(
            lambda c: None if c <= budget else (_ for _ in ()).throw(
                AssertionError(f"compact_planes tail-drop: {c} kept > "
                               f"budget {budget}")),
            jnp.sum(keep.astype(jnp.int32)))
    N = ph.shape[1]
    cum = jnp.cumsum(keep.astype(jnp.int32))
    rank = cum - 1                                         # dest slot
    ohr = ((rank[:, None] == jnp.arange(budget, dtype=jnp.int32)[None, :])
           & keep[:, None]).astype(jnp.float32)            # (N, budget)
    src = ph.at[4].set(keep.astype(jnp.float32))
    return jax.lax.dot_general(
        src, ohr, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)               # (8, budget)


def cloud_from_depth(depth, cam: DCamera, range_lo, range_hi, frac: int,
                     budget: int):
    """Fused PointCloud + takesubsample + compaction: bit-identical to
    point_cloud -> every-frac-th-valid mask -> compact_points, but never
    materialises the (H*W, 3) cloud or sorts 76,800 keys.  Selection runs on
    the (rows, 128) raster: per-row lane cumsums, then fused
    broadcast-compare reductions map output slots to (row, lane); only the
    `budget` selected pixels are deprojected.
    Returns (points (budget,3), mask)."""
    H, W = depth.shape
    assert (H * W) % 128 == 0
    if jax.default_backend() == "tpu" and budget % 8 == 0:
        # whole pipeline in one VMEM-resident kernel (bit-identical; the
        # XLA formulation below streams ~2 GB of intermediates per
        # 512-track frame-step)
        from ..ops.cloud_kernel import cloud_from_depth_kernel
        return cloud_from_depth_kernel(depth, cam, range_lo, range_hi,
                                       frac, budget)
    # all counting runs in f32: every integer here is < 2^24 so f32 is exact,
    # lane cumsums become (R,128)@(128,128) MXU matmuls against a 0/1
    # triangular matrix (integer sums <= 128 — no accumulation error), and no
    # (R,128) i32 tensors are materialised
    draw = depth.astype(jnp.float32).reshape(-1, 128)         # raw units
    d = draw * jnp.float32(cam.depth_scale)                   # fuses into v
    v = (d >= range_lo) & (d < range_hi)                      # (R, 128)
    tri = jnp.triu(jnp.ones((128, 128), jnp.float32))
    c_in = jnp.dot(v.astype(jnp.float32), tri,
                   preferred_element_type=jnp.float32)        # inclusive
    row_tot = c_in[:, -1]
    row_base = jnp.cumsum(row_tot) - row_tot                  # valid before row
    rank = row_base[:, None] + c_in - 1                       # rank among valid
    kept = v & (jnp.floor(rank * (1.0 / frac)) * frac == rank)
    k_in = jnp.dot(kept.astype(jnp.float32), tri,
                   preferred_element_type=jnp.float32)        # inclusive
    krow = k_in[:, -1]
    kbase = jnp.cumsum(krow) - krow                           # kept before row
    total = kbase[-1] + krow[-1]
    # slot -> kept-point index: identity while everything fits; when the kept
    # count exceeds the budget, sample the kept sequence uniformly instead of
    # truncating its tail (a raster-order tail drop cuts the bottom of the
    # hand; the reference keeps all points, physmodel.h:163-181, so the
    # unbiased subset tracks its fit far better).  int32: s*K < 2^31, exact.
    si = jnp.arange(budget, dtype=jnp.int32)
    Ki = total.astype(jnp.int32)
    t_i = jnp.where(Ki > budget, (si * Ki) // budget, si)
    s = t_i.astype(jnp.float32)
    # slot -> (row, lane): broadcast-compare reductions (XLA fuses these; a
    # searchsorted lowers to a while-loop of gathers and is ~50x slower)
    le = kbase[None, :] <= s[:, None]                         # (S, R) fused
    row = jnp.sum(le.astype(jnp.int32), axis=1) - 1
    # one-hot of `row` (le is monotone in r: last true column wins); the two
    # (S, 128) row gathers of k_in / raw depth become MXU matmuls — exact,
    # since each one-hot row has a single 1 (no accumulation)
    oh_row = (le & ~jnp.concatenate(
        [le[:, 1:], jnp.zeros((budget, 1), bool)], axis=1)).astype(jnp.float32)
    j = s - jnp.sum(oh_row * kbase[None, :], axis=1)          # s - kbase[row]
    # exact bf16 picks (single-term sums; k_in <= 128 fits bf16, raw depth
    # splits into two <=8-bit planes) — an f32 HIGHEST matmul costs 6 passes
    oh16 = oh_row.astype(jnp.bfloat16)
    hi8 = jnp.floor(draw * (1.0 / 256.0))
    lo8 = draw - hi8 * 256.0
    k_rows = jnp.dot(oh16, k_in.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)      # (S, 128)
    d_rows = (jnp.dot(oh16, hi8.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) * 256.0
              + jnp.dot(oh16, lo8.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32))  # (S, 128)
    lane = jnp.sum((k_rows <= j[:, None]).astype(jnp.int32), axis=1)
    lane = jnp.minimum(lane, 127)
    lanes = jnp.arange(128, dtype=jnp.int32)
    z = jnp.sum(jnp.where(lanes[None, :] == lane[:, None], d_rows, 0.0),
                axis=1) * cam.depth_scale
    ok = s < total
    flat = row * 128 + lane
    px = (flat % W).astype(jnp.float32)
    py = (flat // W).astype(jnp.float32)
    pts = cam.deprojectz(jnp.stack([px, py], -1), z)
    return pts, ok
