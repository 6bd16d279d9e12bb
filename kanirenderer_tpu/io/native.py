"""ctypes bindings to libkani_native.so with pure-Python fallbacks.

The native library (native/kani_native.cpp) provides the host-side hot
loops — OBJ parsing, TBN accumulation, Morton ordering, PNG encode — and
the embeddable ``run_kanirenderer`` C ABI.  Everything here degrades
gracefully to the Python implementations when the .so is absent; build it
with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    candidates = [
        os.environ.get("KANI_NATIVE_LIB", ""),
        os.path.join(here, "native", "libkani_native.so"),
        "libkani_native.so",
    ]
    for c in candidates:
        if not c:
            continue
        try:
            return ctypes.CDLL(c)
        except OSError:
            continue
    return None


def get_lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _find_lib()
        if _LIB is not None:
            _LIB.kani_compute_tbn.restype = ctypes.c_int
            _LIB.kani_morton_order.restype = ctypes.c_int
            _LIB.kani_obj_parse.restype = ctypes.c_void_p
            _LIB.kani_obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            _LIB.kani_obj_mesh_count.argtypes = [ctypes.c_void_p]
            _LIB.kani_obj_mesh_verts.restype = ctypes.c_int64
            _LIB.kani_obj_mesh_verts.argtypes = [ctypes.c_void_p,
                                                 ctypes.c_int]
            _LIB.kani_obj_mesh_tris.restype = ctypes.c_int64
            _LIB.kani_obj_mesh_tris.argtypes = [ctypes.c_void_p, ctypes.c_int]
            _LIB.kani_obj_mesh_material.argtypes = [ctypes.c_void_p,
                                                    ctypes.c_int]
            _LIB.kani_obj_material_count.argtypes = [ctypes.c_void_p]
            _LIB.kani_obj_material_name.restype = ctypes.c_char_p
            _LIB.kani_obj_material_name.argtypes = [ctypes.c_void_p,
                                                    ctypes.c_int]
            _LIB.kani_obj_mtllib.restype = ctypes.c_char_p
            _LIB.kani_obj_mtllib.argtypes = [ctypes.c_void_p]
            _LIB.kani_obj_mesh_copy.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32)]
            _LIB.kani_obj_free.argtypes = [ctypes.c_void_p]
            _LIB.kani_write_png.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int]
    return _LIB


def available() -> bool:
    return get_lib() is not None


def compute_tbn(positions: np.ndarray, texcoords: np.ndarray,
                indices: np.ndarray):
    """Native TBN accumulation; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float32)
    uv = np.ascontiguousarray(texcoords, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    tan = np.zeros_like(pos)
    bit = np.zeros_like(pos)
    lib.kani_compute_tbn(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(pos)), ctypes.c_int64(len(idx)),
        tan.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bit.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return tan, bit


def morton_order(centroids: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    c = np.ascontiguousarray(centroids, np.float32)
    order = np.zeros(len(c), np.int32)
    lib.kani_morton_order(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(c)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return order.astype(np.int64)


def parse_obj(text: str):
    """Native OBJ parse → (meshes, material_names, mtllib) or None.

    meshes: list of dicts {positions, texcoords, normals, indices,
    material_id (index into material_names, 0 when none)}.
    """
    lib = get_lib()
    if lib is None:
        return None
    data = text.encode("utf-8", errors="replace")
    h = lib.kani_obj_parse(data, len(data))
    if not h:
        return None
    try:
        meshes = []
        for i in range(lib.kani_obj_mesh_count(h)):
            nv = lib.kani_obj_mesh_verts(h, i)
            nt = lib.kani_obj_mesh_tris(h, i)
            pos = np.zeros((nv, 3), np.float32)
            uv = np.zeros((nv, 2), np.float32)
            nrm = np.zeros((nv, 3), np.float32)
            idx = np.zeros((nt, 3), np.int32)
            lib.kani_obj_mesh_copy(
                h, i,
                pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            meshes.append(dict(positions=pos, texcoords=uv, normals=nrm,
                               indices=idx,
                               material_id=lib.kani_obj_mesh_material(h, i)))
        names = [lib.kani_obj_material_name(h, i).decode()
                 for i in range(lib.kani_obj_material_count(h))]
        mtllib = lib.kani_obj_mtllib(h).decode()
        return meshes, names, mtllib
    finally:
        lib.kani_obj_free(h)


def write_png(path: str, img: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(img, np.uint8)
    c = arr.shape[2] if arr.ndim == 3 else 1
    rc = lib.kani_write_png(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arr.shape[1], arr.shape[0], c)
    return rc == 0
