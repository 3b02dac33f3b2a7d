"""ctypes bindings for the native host-runtime library.

Loads native/libmadarch_native.so (built by ``make -C native``; auto-built
on first use when a compiler is available) and exposes:

- ``load_obj``: fast OBJ parsing -> numpy arrays
- ``build_bvh``: SAH BVH construction -> BVHNode tree
- ``distance_transform``: Danielsson vector distance transform of an
  occupancy grid (the reference's meshes-distance_maps.adb:17-145 baker)

Every entry point has a pure-Python fallback, so the package works without
the native build; ``available()`` reports which path is active.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmadarch_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.md_load_obj.restype = ctypes.c_int
    lib.md_load_obj.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.md_free.argtypes = [ctypes.c_void_p]
    lib.md_build_bvh.restype = ctypes.c_int
    lib.md_build_bvh.argtypes = [
        np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(
            np.float32), ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(
            np.float32),
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.md_distance_transform.argtypes = [
        np.ctypeslib.ndpointer(np.uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        np.ctypeslib.ndpointer(np.float32),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def load_obj(path: str):
    """Native OBJ parse; falls back to the Python parser."""
    lib = _load()
    if lib is None:
        from madarch_tpu.scene.mesh import load_obj as py_load
        return py_load(path)

    from madarch_tpu.scene.mesh import Mesh
    verts_p = ctypes.POINTER(ctypes.c_float)()
    norms_p = ctypes.POINTER(ctypes.c_float)()
    tris_p = ctypes.POINTER(ctypes.c_int)()
    tri_ns_p = ctypes.POINTER(ctypes.c_int)()
    nv = ctypes.c_int()
    nn = ctypes.c_int()
    nt = ctypes.c_int()
    rc = lib.md_load_obj(path.encode(), ctypes.byref(verts_p),
                         ctypes.byref(nv), ctypes.byref(norms_p),
                         ctypes.byref(nn), ctypes.byref(tris_p),
                         ctypes.byref(tri_ns_p), ctypes.byref(nt))
    if rc != 0:
        raise FileNotFoundError(path)
    try:
        verts = np.ctypeslib.as_array(verts_p,
                                      (nv.value, 3)).copy()
        norms = (np.ctypeslib.as_array(norms_p, (nn.value, 3)).copy()
                 if nn.value else np.zeros((0, 3), np.float32))
        tris = np.ctypeslib.as_array(tris_p, (nt.value, 3)).copy()
        tri_ns = np.ctypeslib.as_array(tri_ns_p, (nt.value, 3)).copy()
    finally:
        for p in (verts_p, norms_p, tris_p, tri_ns_p):
            lib.md_free(p)
    return Mesh(vertices=verts.astype(np.float32),
                normals=norms.astype(np.float32),
                triangles=tris.astype(np.int32),
                tri_normals=tri_ns.astype(np.int32))


def build_bvh(bboxes, leaf_size: int = 1):
    """Native SAH BVH; falls back to the Python builder.  leaf_size must be
    1 on the native path (the reference's leaves are single-primitive)."""
    lib = _load()
    if lib is None or leaf_size != 1:
        from madarch_tpu.scene.bvh import build_bvh as py_build
        return py_build(bboxes, leaf_size)

    from madarch_tpu.scene.bvh import BVHNode
    los = np.ascontiguousarray([b[0] for b in bboxes], np.float32)
    his = np.ascontiguousarray([b[1] for b in bboxes], np.float32)
    n = len(bboxes)
    max_nodes = 2 * n - 1
    node_lo = np.empty((max_nodes, 3), np.float32)
    node_hi = np.empty((max_nodes, 3), np.float32)
    left = np.empty(max_nodes, np.int32)
    right = np.empty(max_nodes, np.int32)
    leaf = np.empty(max_nodes, np.int32)
    n_nodes = ctypes.c_int()
    rc = lib.md_build_bvh(los, his, n, node_lo, node_hi, left, right, leaf,
                          ctypes.byref(n_nodes))
    if rc != 0:
        raise RuntimeError("md_build_bvh failed")

    def rebuild(i: int) -> BVHNode:
        if leaf[i] >= 0:
            return BVHNode(lo=node_lo[i].copy(), hi=node_hi[i].copy(),
                           indices=np.asarray([leaf[i]], np.int64))
        return BVHNode(lo=node_lo[i].copy(), hi=node_hi[i].copy(),
                       left=rebuild(left[i]), right=rebuild(right[i]))

    return rebuild(0)


def distance_transform(occupancy: np.ndarray, spacing=(1.0, 1.0, 1.0)):
    """Danielsson vector distance transform of a bool/uint8 occupancy grid;
    returns f32 distances in world units.  Pure-numpy fallback is a brute
    force over occupied sites (fine for small grids)."""
    occ = np.ascontiguousarray(occupancy.astype(np.uint8))
    nx, ny, nz = occ.shape
    lib = _load()
    if lib is not None:
        out = np.empty((nx, ny, nz), np.float32)
        lib.md_distance_transform(occ, nx, ny, nz,
                                  float(spacing[0]), float(spacing[1]),
                                  float(spacing[2]), out)
        return out
    # fallback: exact brute force
    sites = np.argwhere(occ > 0)
    if len(sites) == 0:
        return np.full((nx, ny, nz), np.inf, np.float32)
    ix, iy, iz = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                             indexing="ij")
    pts = np.stack([ix, iy, iz], -1).reshape(-1, 3).astype(np.float32)
    sp = np.asarray(spacing, np.float32)
    d = np.min(np.linalg.norm(
        (pts[:, None] - sites[None].astype(np.float32)) * sp, axis=-1),
        axis=1)
    return d.reshape(nx, ny, nz).astype(np.float32)
