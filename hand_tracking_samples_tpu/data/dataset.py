"""Dataset I/O: the reference's parallel-file recording format, bit-compatible.

Format (include/dataset.h:1-10):
  <name>.json   camera intrinsics + header (DatasetInfo)
  <name>.rs     binary uint16 depth, width*height per frame, appended
  <name>.ir     uint8 IR, same layout
  <name>.pose   ascii: 17 x (position xyz, quaternion xyzw) per line
  <name>.rgb / <name>.feye   optional colour / fisheye streams

Recordings made by the reference's realtime-annotator load here unchanged,
and recordings written here load in the reference apps.
"""
from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from ..imaging.camera import DCamera


@dataclasses.dataclass
class DatasetInfo:
    """dataset.h:21-37 DatasetInfo; field names match visit_fields."""
    dims: tuple = (320, 240)
    focal: tuple = (241.811768, 241.811768)
    principal: tuple = (162.830505, 118.740089)
    depth_scale: float = 0.001
    mplane: tuple = (0.0, 0.0, 0.0, 0.0)
    fname: str = ""
    camtype: str = "tpu"
    hasir: bool = False
    rgb_dim: tuple = (640, 480)
    feye_dim: tuple = (640, 480)
    segment_scale: float = 0.17

    def to_json_dict(self):
        return {
            "dcamera": {
                "dims": list(self.dims),
                "focal": list(self.focal),
                "principal": list(self.principal),
                "depth_scale": self.depth_scale,
            },
            "mplane": list(self.mplane),
            "fname": self.fname,
            "camtype": self.camtype,
            "hasir": self.hasir,
            "rgb_dim": list(self.rgb_dim),
            "feyedim": list(self.feye_dim),
            "segment_scale": self.segment_scale,
        }

    @staticmethod
    def from_json_dict(js):
        cam = js.get("dcamera", {})
        return DatasetInfo(
            dims=tuple(cam.get("dims", (320, 240))),
            focal=tuple(cam.get("focal", (241.811768, 241.811768))),
            principal=tuple(cam.get("principal", (162.830505, 118.740089))),
            depth_scale=float(cam.get("depth_scale", 0.001)),
            mplane=tuple(js.get("mplane", (0, 0, 0, 0))),
            fname=js.get("fname", ""),
            camtype=js.get("camtype", ""),
            hasir=bool(js.get("hasir", False)),
            rgb_dim=tuple(js.get("rgb_dim", (640, 480))),
            feye_dim=tuple(js.get("feyedim", (640, 480))),
            segment_scale=float(js.get("segment_scale", 0.17)),
        )

    def mirror_plane(self) -> tuple:
        """The dataset's mirror-rig plane, or () when absent.  The reference
        stores sentinels (0,0,0,0)/(0,0,0,FLT_MAX) for no-mirror
        (dataset.h:24,45); a real plane has a unit-ish normal."""
        n = self.mplane[:3]
        return tuple(self.mplane) if (n[0] ** 2 + n[1] ** 2 + n[2] ** 2) > 0.25 \
            else ()

    def camera(self) -> DCamera:
        return DCamera.make(self.dims, self.focal, self.principal,
                            self.depth_scale)


@dataclasses.dataclass
class Dataset:
    """A loaded recording: batched arrays instead of per-frame objects."""
    info: DatasetInfo
    depth: np.ndarray          # (F, H, W) uint16
    pose: np.ndarray           # (F, 17, 7) float32 (zeros if absent)
    ir: np.ndarray | None      # (F, H, W) uint8 or None


def load_dataset(bname: str, n_bones: int = 17) -> Dataset:
    """load_dataset (dataset.h:109-163) as one batched read."""
    if not os.path.exists(bname + ".json"):
        raise FileNotFoundError(
            f"no recording '{bname}': expected {bname}.json/.rs "
            f"(pass the basename or the .rs path)")
    with open(bname + ".json") as f:
        info = DatasetInfo.from_json_dict(json.load(f))
    w, h = info.dims
    raw = np.fromfile(bname + ".rs", dtype=np.uint16)
    frames = len(raw) // (w * h)
    depth = raw[: frames * w * h].reshape(frames, h, w)

    pose = np.zeros((frames, n_bones, 7), np.float32)
    if os.path.exists(bname + ".pose"):
        vals = np.loadtxt(bname + ".pose", dtype=np.float32, ndmin=2)
        vals = vals.reshape(-1, n_bones, 7)[:frames]
        pose[: len(vals)] = vals

    ir = None
    if os.path.exists(bname + ".ir"):
        iraw = np.fromfile(bname + ".ir", dtype=np.uint8)
        if len(iraw) >= frames * w * h:
            ir = iraw[: frames * w * h].reshape(frames, h, w)
    return Dataset(info=info, depth=depth, pose=pose, ir=ir)


class DatasetWriter:
    """DepthDataStreamOut (dataset.h:62-106): streaming append writer."""

    def __init__(self, prefix: str, info: DatasetInfo | None = None):
        self.prefix = prefix
        self.info = info or DatasetInfo(fname=prefix)
        self.info.fname = prefix
        os.makedirs(os.path.dirname(os.path.abspath(prefix)), exist_ok=True)
        with open(prefix + ".json", "w") as f:
            json.dump(self.info.to_json_dict(), f, indent=2)
        self._depth = open(prefix + ".rs", "wb")
        self._ir = open(prefix + ".ir", "wb")
        self._pose = open(prefix + ".pose", "w")

    def save_frame(self, depth: np.ndarray, pose: np.ndarray,
                   ir: np.ndarray | None = None):
        """depth (H,W) uint16; pose (17,7); ir (H,W) uint8 optional."""
        np.asarray(depth, np.uint16).tofile(self._depth)
        if ir is None:
            ir = np.zeros(depth.shape, np.uint8)
        np.asarray(ir, np.uint8).tofile(self._ir)
        parts = []
        for p in np.asarray(pose, np.float32):
            parts.append(" ".join(f"{v:g}" for v in p[:3]) + "  "
                         + " ".join(f"{v:g}" for v in p[3:]))
        self._pose.write("   ".join(parts) + "\n")

    def save_frames(self, depth, pose, ir=None):
        for f in range(len(depth)):
            self.save_frame(depth[f], pose[f], None if ir is None else ir[f])

    def close(self):
        self._depth.close()
        self._ir.close()
        self._pose.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def update_background(background, depth, fudge: int = 3):
    """RSCam::addbackground (dcam.h:157-162): running min of observed depth
    (minus a fudge) used by FilterDS4's background subtraction.
    background None -> initialised at 4096."""
    if background is None:
        background = np.full(depth.shape, 4096, np.uint16)
    return np.minimum(background,
                      (depth.astype(np.int32) - fudge).clip(0).astype(np.uint16))


def filter_ivy(depth: np.ndarray, depth_scale: float = 0.001) -> np.ndarray:
    """FilterIvy (dcam.h:209-226): zero depth -> 4 m fill."""
    const = np.uint16(4.0 / depth_scale)
    return np.where(depth == 0, const, depth)


def filter_ds4(depth: np.ndarray, ir: np.ndarray,
               background: np.ndarray | None = None) -> np.ndarray:
    """FilterDS4 (dcam.h:174-208): dark-IR and flying-pixel rejection plus
    optional background subtraction, vectorised."""
    d = depth.astype(np.int32)
    out = depth.copy()
    out[(depth < 30) | (ir < 8)] = 4096
    d = out.astype(np.int32)

    def has_neighbor(axis, dist):
        lo = np.abs(np.roll(d, dist, axis) - d) < 10
        hi = np.abs(np.roll(d, -dist, axis) - d) < 10
        return lo | hi

    flying = ~(has_neighbor(1, 1) & has_neighbor(0, 1)
               & has_neighbor(1, 2) & has_neighbor(0, 2))
    flying[:2, :] = False
    flying[-2:, :] = False
    flying[:, :2] = False
    flying[:, -2:] = False
    out[flying] = 4096
    if background is not None:
        out[out > background] = 4096
    return out
