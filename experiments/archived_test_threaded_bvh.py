"""Threaded (preorder/skip) BVH packing + per-ray walk reference.

The Pallas walk kernel (ops/trace_wavefront.walk_leaves) is validated
against walk_leaves_ref on the real chip (scripts/tpu_smoke.py); here we
pin the HOST-side invariants of pack_threaded and the reference walk
itself against a brute-force leaf query.
"""

from __future__ import annotations

import numpy as np

from prosper_tpu.accel.bvh import build_bvh, pack_threaded
from prosper_tpu.ops.trace_wavefront import walk_leaves_ref


def _scene(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    h = rng.uniform(0.02, 0.15, (n, 3)).astype(np.float32)
    return c - h, c + h


def _brute_leaves(bmin, bmax, o, d, tmax):
    inv = np.where(np.abs(d) > 1e-12, 1.0 / d, 1e30)
    t0 = (bmin - o) * inv
    t1 = (bmax - o) * inv
    enter = np.maximum(np.minimum(t0, t1).max(axis=1), 0.0)
    exit_ = np.maximum(t0, t1).min(axis=1)
    return set(np.nonzero((enter <= exit_) & (enter < tmax))[0].tolist())


def test_pack_threaded_structure():
    bmin, bmax = _scene(97)
    bvh = build_bvh(bmin, bmax, max_leaf_size=1)
    table = pack_threaded(bvh)
    n = bvh.n_nodes
    flat = table.transpose(0, 2, 1).reshape(-1, 8)
    n_term = flat.shape[0]
    skip = flat[:, 6].astype(np.int64)
    leaf = flat[:, 7].astype(np.int64)
    # skips strictly advance (no self-loops, bounded termination)
    assert (skip[:n] > np.arange(n)).all()
    assert (skip <= n_term).all()
    # every input cluster appears exactly once as a leaf
    leaves = np.sort(leaf[leaf >= 0])
    assert np.array_equal(leaves, np.arange(97))
    # padded nodes never hit (NaN bounds)
    assert np.isnan(flat[n:, 0:6]).all()


def test_walk_ref_matches_brute_force():
    bmin, bmax = _scene(131, seed=3)
    bvh = build_bvh(bmin, bmax, max_leaf_size=1)
    table = pack_threaded(bvh)
    rng = np.random.default_rng(7)
    R = 64
    o = rng.uniform(-1.5, 1.5, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = np.full(R, np.inf, np.float32)
    tmax[: R // 4] = rng.uniform(0.1, 2.0, R // 4)
    leaves, counts = walk_leaves_ref(table, o, d, tmax, l_cap=256)
    for r in range(R):
        got = set(leaves[r, : counts[r]].tolist())
        want = _brute_leaves(bmin, bmax, o[r], d[r], tmax[r])
        assert got == want, (r, got ^ want)
