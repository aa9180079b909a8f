"""ctypes bindings for the native C++ asset pipeline (cpp/asset_pipeline.cpp).

The reference's mesh pipeline runs in C++ (meshoptimizer, MikkTSpace,
DeferredLoadingContext.cpp:266-440); ours does too when the shared
library is present — build with `make -C cpp` (done automatically on
first use when a compiler is available). Every entry point has a numpy
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_CPP_DIR, "libasset_pipeline.so"))
    # Always invoke make: the Makefile is dependency-driven, so a stale
    # .so is rebuilt when asset_pipeline.cpp changed (and it's a no-op
    # otherwise). A missing toolchain falls back to the numpy paths.
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_CPP_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        if not os.path.exists(so):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    u64 = ctypes.c_uint64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")

    lib.morton_order.argtypes = [f32p, u64, u32p, u64, u32p]
    lib.cluster_bounds.argtypes = [
        f32p, u32p, u32p, u32p, u64, f32p, f32p, f32p, f32p, f32p, f32p,
    ]
    lib.smooth_normals.argtypes = [f32p, u64, u32p, u64, f32p]
    lib.lengyel_tangents.argtypes = [f32p, f32p, f32p, u64, u32p, u64, f32p]
    lib.mikktspace_tangents.argtypes = [f32p, f32p, f32p, u64, u32p, u64, f32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def morton_order(positions: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """(T,) permutation sorting triangles along a Morton curve."""
    lib = _load()
    positions = np.ascontiguousarray(positions, np.float32)
    tris = np.ascontiguousarray(tris, np.uint32)
    n_tris = len(tris)
    if lib is None:
        from .meshlets import morton_order as np_morton

        p0 = positions[tris[:, 0]]
        p1 = positions[tris[:, 1]]
        p2 = positions[tris[:, 2]]
        return np_morton((p0 + p1 + p2) / 3.0).astype(np.uint32)
    out = np.empty(n_tris, np.uint32)
    lib.morton_order(positions, len(positions), tris.reshape(-1), n_tris, out)
    return out


def cluster_bounds(
    positions: np.ndarray,
    tris: np.ndarray,
    offsets: np.ndarray,
    counts: np.ndarray,
):
    """Per-cluster AABB/sphere/cone over pre-ordered triangles."""
    lib = _load()
    if lib is None:
        return None  # caller falls back to the numpy path
    positions = np.ascontiguousarray(positions, np.float32)
    tris = np.ascontiguousarray(tris, np.uint32).reshape(-1)
    offsets = np.ascontiguousarray(offsets, np.uint32)
    counts = np.ascontiguousarray(counts, np.uint32)
    c = len(offsets)
    aabb_min = np.empty((c, 3), np.float32)
    aabb_max = np.empty((c, 3), np.float32)
    center = np.empty((c, 3), np.float32)
    radius = np.empty(c, np.float32)
    axis = np.empty((c, 3), np.float32)
    cutoff = np.empty(c, np.float32)
    lib.cluster_bounds(
        positions, tris, offsets, counts, c,
        aabb_min.reshape(-1), aabb_max.reshape(-1), center.reshape(-1),
        radius, axis.reshape(-1), cutoff,
    )
    return aabb_min, aabb_max, center, radius, axis, cutoff


def smooth_normals(positions: np.ndarray, tris: np.ndarray) -> np.ndarray:
    lib = _load()
    positions = np.ascontiguousarray(positions, np.float32)
    tris = np.ascontiguousarray(tris, np.uint32)
    if lib is None:
        from .world import _smooth_normals

        return _smooth_normals(positions, tris)
    out = np.empty_like(positions)
    lib.smooth_normals(
        positions, len(positions), tris.reshape(-1), len(tris), out.reshape(-1)
    )
    return out


def lengyel_tangents(
    positions: np.ndarray,
    normals: np.ndarray,
    uvs: np.ndarray,
    tris: np.ndarray,
) -> np.ndarray:
    """(V, 4) UV-space tangents + handedness (MikkTSpace-stage analog)."""
    lib = _load()
    positions = np.ascontiguousarray(positions, np.float32)
    normals = np.ascontiguousarray(normals, np.float32)
    uvs = np.ascontiguousarray(uvs, np.float32)
    tris = np.ascontiguousarray(tris, np.uint32)
    if lib is None:
        # numpy fallback: same algorithm, vectorised
        V = len(positions)
        tan = np.zeros((V, 3), np.float64)
        bit = np.zeros((V, 3), np.float64)
        p0, p1, p2 = (positions[tris[:, i]] for i in range(3))
        w0, w1, w2 = (uvs[tris[:, i]] for i in range(3))
        e1, e2 = p1 - p0, p2 - p0
        x1, x2 = w1[:, 0] - w0[:, 0], w2[:, 0] - w0[:, 0]
        y1, y2 = w1[:, 1] - w0[:, 1], w2[:, 1] - w0[:, 1]
        det = x1 * y2 - x2 * y1
        ok = np.abs(det) > 1e-12
        r = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)[:, None]
        sdir = (e1 * y2[:, None] - e2 * y1[:, None]) * r
        tdir = (e2 * x1[:, None] - e1 * x2[:, None]) * r
        for i in range(3):
            np.add.at(tan, tris[:, i], sdir)
            np.add.at(bit, tris[:, i], tdir)
        n = normals.astype(np.float64)
        t = tan - n * np.sum(n * tan, axis=1, keepdims=True)
        tl = np.linalg.norm(t, axis=1, keepdims=True)
        bad = tl[:, 0] < 1e-12
        ref = np.where(
            np.abs(n[:, 1:2]) < 0.99, np.array([[0.0, 1, 0]]), np.array([[1.0, 0, 0]])
        )
        fb = np.cross(ref, n)
        fb /= np.maximum(np.linalg.norm(fb, axis=1, keepdims=True), 1e-20)
        t = np.where(bad[:, None], fb, t / np.maximum(tl, 1e-20))
        sign = np.where(np.sum(np.cross(n, t) * bit, axis=1) < 0.0, -1.0, 1.0)
        out = np.concatenate([t, sign[:, None]], axis=1).astype(np.float32)
        return out
    out = np.empty((len(positions), 4), np.float32)
    lib.lengyel_tangents(
        positions, normals, uvs, len(positions), tris.reshape(-1), len(tris),
        out.reshape(-1),
    )
    return out


def mikktspace_tangents(
    positions: np.ndarray,
    normals: np.ndarray,
    uvs: np.ndarray,
    tris: np.ndarray,
) -> np.ndarray:
    """(V, 4) MikkTSpace-algorithm tangents + handedness.

    Port of the algorithm the reference's generateTangents runs through
    the real MikkTSpace library (DeferredLoadingContext.cpp:266-338):
    per-face dP/du tangents, projected onto the vertex normal plane and
    normalized per corner, angle-weighted, welded by exact
    (position, normal, uv) with mirrored wedges in separate groups.
    """
    lib = _load()
    positions = np.ascontiguousarray(positions, np.float32)
    normals = np.ascontiguousarray(normals, np.float32)
    uvs = np.ascontiguousarray(uvs, np.float32)
    tris = np.ascontiguousarray(tris, np.uint32)
    if lib is not None:
        out = np.empty((len(positions), 4), np.float32)
        lib.mikktspace_tangents(
            positions, normals, uvs, len(positions), tris.reshape(-1),
            len(tris), out.reshape(-1),
        )
        return out

    # numpy fallback: same algorithm, vectorised
    V = len(positions)
    key = np.concatenate([positions, normals, uvs], axis=1)
    _, canon = np.unique(
        key.view([("", np.float32)] * 8), return_inverse=True, axis=0
    )
    canon = canon.reshape(-1)

    p0, p1, p2 = (positions[tris[:, i]].astype(np.float64) for i in range(3))
    w0, w1, w2 = (uvs[tris[:, i]].astype(np.float64) for i in range(3))
    e1, e2 = p1 - p0, p2 - p0
    x1, x2 = w1[:, 0] - w0[:, 0], w2[:, 0] - w0[:, 0]
    y1, y2 = w1[:, 1] - w0[:, 1], w2[:, 1] - w0[:, 1]
    det = x1 * y2 - x2 * y1
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)[:, None]
    tface = (e1 * y2[:, None] - e2 * y1[:, None]) * inv
    orient = (det < 0).astype(np.int64)

    acc = np.zeros((2 * V, 3), np.float64)
    wsum = np.zeros(2 * V, np.float64)
    pts = [p0, p1, p2]
    for c in range(3):
        n = normals[tris[:, c]].astype(np.float64)
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
        tp = tface - n * np.sum(n * tface, axis=1, keepdims=True)
        tl = np.linalg.norm(tp, axis=1, keepdims=True)
        good = ok & (tl[:, 0] > 1e-20)
        tp = np.where(good[:, None], tp / np.maximum(tl, 1e-20), 0.0)
        ea = pts[(c + 1) % 3] - pts[c]
        eb = pts[(c + 2) % 3] - pts[c]
        na = ea / np.maximum(np.linalg.norm(ea, axis=1, keepdims=True), 1e-20)
        nb = eb / np.maximum(np.linalg.norm(eb, axis=1, keepdims=True), 1e-20)
        ang = np.arccos(np.clip(np.sum(na * nb, axis=1), -1.0, 1.0))
        g = 2 * canon[tris[:, c]] + orient
        np.add.at(acc, g, tp * np.where(good, ang, 0.0)[:, None])
        np.add.at(wsum, g, np.where(good, ang, 0.0))

    out = np.empty((V, 4), np.float32)
    n = normals.astype(np.float64)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-20)
    g0 = 2 * canon
    use1 = wsum[g0 + 1] > wsum[g0]
    g = g0 + use1.astype(np.int64)
    tsum = acc[g]
    tp = tsum - n * np.sum(n * tsum, axis=1, keepdims=True)
    tl = np.linalg.norm(tp, axis=1, keepdims=True)
    bad = (wsum[g] <= 0.0) | (tl[:, 0] < 1e-20)
    ref = np.where(
        np.abs(n[:, 1:2]) < 0.99, np.array([[0.0, 1, 0]]), np.array([[1.0, 0, 0]])
    )
    fb = np.cross(ref, n)
    fb /= np.maximum(np.linalg.norm(fb, axis=1, keepdims=True), 1e-20)
    t = np.where(bad[:, None], fb, tp / np.maximum(tl, 1e-20))
    sign = np.where(bad, 1.0, np.where(use1, -1.0, 1.0))
    out[:, :3] = t.astype(np.float32)
    out[:, 3] = sign.astype(np.float32)
    return out
