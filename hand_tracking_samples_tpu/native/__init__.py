"""Native (C++) dataset streaming loader, bound via ctypes.

The reference overlaps disk IO with work using std::async (train-cnn.cpp:61,
126-138); at TPU feed rates a Python reader stalls the device, so the stream
decode runs on C++ worker threads behind a bounded ring of batches.

    from hand_tracking_samples_tpu.native import StreamingLoader
    with StreamingLoader(["rec1", "rec2"], batch=64) as ld:
        for depth, pose, ids in ld:       # numpy views, zero extra copies
            ...

The shared library builds on first use (g++, a few seconds) and is cached
next to this file.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhts_loader.so")
_SRC = os.path.join(_DIR, "loader.cpp")


def _build():
    cmd = ["c++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _lib():
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.hts_open.restype = ctypes.c_void_p
    lib.hts_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                             ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int]
    lib.hts_total_frames.restype = ctypes.c_int64
    lib.hts_total_frames.argtypes = [ctypes.c_void_p]
    lib.hts_next_batch.restype = ctypes.c_int
    lib.hts_next_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p, ctypes.c_void_p]
    lib.hts_close.argtypes = [ctypes.c_void_p]
    return lib


class StreamingLoader:
    """Iterates (depth (B,H,W) uint16, pose (B,17,7) f32, ids (B,) i32)."""

    def __init__(self, basenames, width=320, height=240, batch=64,
                 capacity=4):
        self._lib = _lib()
        arr = (ctypes.c_char_p * len(basenames))(
            *[b.encode() for b in basenames])
        self._h = self._lib.hts_open(arr, len(basenames), width, height,
                                     batch, capacity)
        if not self._h:
            raise RuntimeError("hts_open failed")
        self.width, self.height, self.batch = width, height, batch
        self.total_frames = self._lib.hts_total_frames(self._h)

    def __iter__(self):
        while True:
            depth = np.empty((self.batch, self.height, self.width), np.uint16)
            pose = np.empty((self.batch, 17, 7), np.float32)
            ids = np.empty((self.batch,), np.int32)
            n = self._lib.hts_next_batch(
                self._h, depth.ctypes.data_as(ctypes.c_void_p),
                pose.ctypes.data_as(ctypes.c_void_p),
                ids.ctypes.data_as(ctypes.c_void_p))
            if n <= 0:
                return
            yield depth[:n], pose[:n], ids[:n]

    def close(self):
        if self._h:
            self._lib.hts_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
