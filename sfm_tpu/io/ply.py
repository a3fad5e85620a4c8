"""Point-cloud export: the STLReader usage surface (SURVEY.md §2.10)
— addPointsToCloud / centerVolume / scaleVolume / normaliseVolume /
writePLYPointCloud — backed by the native C++ runtime
(sfm_tpu/native/pointcloud.cpp via ctypes), with a pure-numpy fallback
when the shared library has not been built (``make -C sfm_tpu/native``)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), os.pardir, "native",
                         "libsfm_native.so")
_lib = None


def _native():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        # build on demand if a toolchain is present; fall back otherwise
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.pc_center.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.pc_scale.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                             ctypes.c_float]
    lib.pc_scale.restype = ctypes.c_float
    lib.pc_normalize.argtypes = [ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int64]
    lib.pc_write_ply.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_void_p, ctypes.c_int64]
    lib.pc_write_ply.restype = ctypes.c_int
    lib.pc_read_ply.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_void_p, ctypes.c_int64]
    lib.pc_read_ply.restype = ctypes.c_int64
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class PointCloud:
    """Mutable host-side cloud (the STLReader container equivalent)."""

    def __init__(self, xyz: Optional[np.ndarray] = None,
                 colors: Optional[np.ndarray] = None):
        self.xyz = np.ascontiguousarray(
            np.zeros((0, 3), np.float32) if xyz is None else
            np.asarray(xyz, np.float32))
        self.colors = None if colors is None else np.ascontiguousarray(
            np.asarray(colors, np.uint8))

    def add_points(self, xyz: np.ndarray,
                   colors: Optional[np.ndarray] = None):
        xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
        self.xyz = np.ascontiguousarray(np.concatenate([self.xyz, xyz]))
        if colors is not None:
            cur = self.colors if self.colors is not None else \
                np.zeros((0, 3), np.uint8)
            self.colors = np.ascontiguousarray(
                np.concatenate([cur, np.asarray(colors, np.uint8)
                                .reshape(-1, 3)]))
        return self

    def center(self):
        lib = _native()
        if lib is not None and len(self.xyz):
            lib.pc_center(_fptr(self.xyz), len(self.xyz))
        elif len(self.xyz):
            self.xyz -= self.xyz.mean(0, keepdims=True)
        return self

    def scale(self, target: float = 500.0):
        lib = _native()
        if lib is not None and len(self.xyz):
            lib.pc_scale(_fptr(self.xyz), len(self.xyz), float(target))
        elif len(self.xyz):
            mx = np.abs(self.xyz).max()
            if mx > 0:
                self.xyz *= target / mx
        return self

    def normalize(self):
        lib = _native()
        if lib is not None and len(self.xyz):
            lib.pc_normalize(_fptr(self.xyz), len(self.xyz))
        elif len(self.xyz):
            rms = np.sqrt((self.xyz ** 2).sum(1).mean())
            if rms > 0:
                self.xyz /= rms
        return self

    def write_ply(self, path: str):
        lib = _native()
        if lib is not None:
            cptr = (self.colors.ctypes.data_as(ctypes.c_void_p)
                    if self.colors is not None else None)
            rc = lib.pc_write_ply(path.encode(), _fptr(self.xyz), cptr,
                                  len(self.xyz))
            if rc != 0:
                raise IOError(f"native PLY write failed (code {rc})")
            return self
        # numpy fallback
        with open(path, "wb") as f:
            has_c = self.colors is not None
            hdr = ("ply\nformat binary_little_endian 1.0\n"
                   f"element vertex {len(self.xyz)}\n"
                   "property float x\nproperty float y\nproperty float z\n"
                   + ("property uchar red\nproperty uchar green\n"
                      "property uchar blue\n" if has_c else "")
                   + "end_header\n")
            f.write(hdr.encode())
            if has_c:
                rec = np.zeros(len(self.xyz),
                               dtype=[("xyz", np.float32, 3),
                                      ("rgb", np.uint8, 3)])
                rec["xyz"] = self.xyz
                rec["rgb"] = self.colors
                f.write(rec.tobytes())
            else:
                f.write(self.xyz.astype("<f4").tobytes())
        return self


def read_ply(path: str, max_points: int = 10_000_000):
    """Read a PLY written by this module.  Returns (xyz, colors or None)."""
    lib = _native()
    if lib is not None:
        xyz = np.zeros((max_points, 3), np.float32)
        rgb = np.zeros((max_points, 3), np.uint8)
        n = lib.pc_read_ply(path.encode(), _fptr(xyz),
                            rgb.ctypes.data_as(ctypes.c_void_p), max_points)
        if n < 0:
            raise IOError(f"native PLY read failed: {path}")
        has_c = _ply_has_color(path)
        return xyz[:n].copy(), (rgb[:n].copy() if has_c else None)
    return _read_ply_numpy(path)


def _ply_has_color(path):
    with open(path, "rb") as f:
        head = f.read(4096).decode("latin-1")
    return "property uchar red" in head.split("end_header")[0]


def _read_ply_numpy(path):
    with open(path, "rb") as f:
        data = f.read()
    head, _, body = data.partition(b"end_header\n")
    head = head.decode("latin-1")
    n = int([l for l in head.splitlines()
             if l.startswith("element vertex")][0].split()[-1])
    has_c = "property uchar red" in head
    if has_c:
        rec = np.frombuffer(body, dtype=[("xyz", np.float32, 3),
                                         ("rgb", np.uint8, 3)], count=n)
        return rec["xyz"].copy(), rec["rgb"].copy()
    xyz = np.frombuffer(body, dtype="<f4", count=3 * n).reshape(n, 3)
    return xyz.copy(), None
