"""ctypes bindings for the arahx native geometry library.

Builds `libarahx.so` from `arahx.cpp` on first use if missing (g++ is part
of the baked toolchain). See arahx.cpp for what each op replaces in the
reference.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, 'libarahx.so')
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_HERE, 'arahx.cpp')
        if not os.path.exists(_LIB_PATH) \
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
            subprocess.check_call(
                ['g++', '-O3', '-fPIC', '-shared', '-std=c++17',
                 '-pthread', '-o', _LIB_PATH, src])
        lib = ctypes.CDLL(_LIB_PATH)
        c_float_p = ctypes.POINTER(ctypes.c_float)
        c_int_p = ctypes.POINTER(ctypes.c_int)
        c_u8_p = ctypes.POINTER(ctypes.c_uint8)

        lib.triangle_hash_build.restype = ctypes.c_void_p
        lib.triangle_hash_build.argtypes = [
            c_float_p, ctypes.c_int, c_int_p, ctypes.c_int, ctypes.c_int]
        lib.triangle_hash_free.argtypes = [ctypes.c_void_p]
        lib.points_inside_mesh.argtypes = [
            ctypes.c_void_p, c_float_p, ctypes.c_int, c_u8_p]
        lib.point_mesh_squared_distance.argtypes = [
            c_float_p, ctypes.c_int, c_float_p, ctypes.c_int, c_int_p,
            ctypes.c_int, c_float_p, c_int_p, c_float_p]
        lib.marching_cubes.restype = ctypes.c_void_p
        lib.marching_cubes.argtypes = [
            c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, c_float_p, c_float_p]
        lib.mc_num_verts.argtypes = [ctypes.c_void_p]
        lib.mc_num_faces.argtypes = [ctypes.c_void_p]
        lib.mc_copy.argtypes = [ctypes.c_void_p, c_float_p, c_int_p]
        lib.mc_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


class MeshIntersector:
    """Point-in-mesh queries via 2D triangle hash + z-parity rays
    (reference `im2mesh/utils/libmesh/inside_mesh.py:5-111` equivalent)."""

    def __init__(self, verts: np.ndarray, faces: np.ndarray,
                 resolution: int = 512):
        self._lib = _load()
        self._verts = np.ascontiguousarray(verts, np.float32)
        self._faces = np.ascontiguousarray(faces, np.int32)
        self._handle = self._lib.triangle_hash_build(
            _fp(self._verts), len(self._verts), _ip(self._faces),
            len(self._faces), resolution)

    def query(self, points: np.ndarray) -> np.ndarray:
        pts = np.ascontiguousarray(points, np.float32)
        out = np.zeros(len(pts), np.uint8)
        self._lib.points_inside_mesh(
            self._handle, _fp(pts), len(pts),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.astype(bool)

    def __del__(self):
        if getattr(self, '_handle', None):
            self._lib.triangle_hash_free(self._handle)
            self._handle = None


def check_mesh_contains(verts, faces, points, resolution: int = 512):
    return MeshIntersector(verts, faces, resolution).query(points)


def point_mesh_squared_distance(points, verts, faces):
    """Returns (sq_dist (N,), face_idx (N,), bary (N, 3)) — the libigl
    `point_mesh_squared_distance` + `barycentric_coordinates_tri`
    equivalent used for GT skinning-weight targets."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    n = len(pts)
    sq = np.zeros(n, np.float32)
    fi = np.zeros(n, np.int32)
    bary = np.zeros((n, 3), np.float32)
    lib.point_mesh_squared_distance(
        _fp(pts), n, _fp(v), len(v), _ip(f), len(f), _fp(sq), _ip(fi),
        _fp(bary))
    return sq, fi, bary


def marching_cubes(grid: np.ndarray, iso: float = 0.0, origin=None,
                   spacing=None):
    """Iso-surface of a (nx, ny, nz) scalar grid via marching tetrahedra.
    Returns (verts (V, 3) float32, faces (F, 3) int32)."""
    lib = _load()
    g = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = g.shape
    origin = np.asarray(origin if origin is not None else [0, 0, 0],
                        np.float32)
    spacing = np.asarray(spacing if spacing is not None else [1, 1, 1],
                         np.float32)
    h = lib.marching_cubes(_fp(g), nx, ny, nz, ctypes.c_float(iso),
                           _fp(origin), _fp(spacing))
    nv, nf = lib.mc_num_verts(h), lib.mc_num_faces(h)
    verts = np.zeros((nv, 3), np.float32)
    faces = np.zeros((nf, 3), np.int32)
    if nv:
        lib.mc_copy(h, _fp(verts), _ip(faces))
    lib.mc_free(h)
    return verts, faces


def rasterize_mesh(proj_xy, depth, faces, height, width):
    """Z-buffer rasterize projected triangles.

    Args: proj_xy (V, 2) pixel coords, depth (V,) camera-space z,
    faces (F, 3). Returns (face_idx (H, W) int32 with -1 background,
    bary (H, W, 3), zbuf (H, W))."""
    lib = _load()
    lib.rasterize_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    p = np.ascontiguousarray(proj_xy, np.float32)
    d = np.ascontiguousarray(depth, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    face_buf = np.zeros((height, width), np.int32)
    bary_buf = np.zeros((height, width, 3), np.float32)
    z_buf = np.zeros((height, width), np.float32)
    lib.rasterize_mesh(_fp(p), _fp(d), len(p), _ip(f), len(f),
                       height, width, _ip(face_buf), _fp(bary_buf),
                       _fp(z_buf))
    return face_buf, bary_buf, z_buf
