"""Dense-cull descent kernels (ops/trace_bvh.trace_*_bvh_dense) vs
brute force and vs the stack-descent kernels, in interpret mode on CPU;
the same kernels compile for TPU (scripts/bench_dense.py A/Bs them).

The dense descent replaces the reference's hardware BVH traversal
(/root/reference/src/render/RtReference.cpp:301-527) for INCOHERENT
bounce/shadow wavefronts with one vectorized all-rays x all-clusters
slab pass + front-to-back argmin pops (see _make_descent_dense).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from prosper_tpu.ops import trace, trace_bvh, trace_pallas
from tests.test_trace import _random_scene, _brute_force
from tests.test_trace_bvh import _nodes, interpret_mode


def _rays(seed, R):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


@pytest.mark.parametrize("seed,tile", [(0, 128), (7, 256)])
def test_dense_closest_matches_brute_force(seed, tile):
    tris, wc_min, wc_max = _random_scene(n_clusters=6, seed=seed)
    o, d = _rays(seed + 1, trace.TILE * 2)
    packed = trace_pallas.pack_tris(tris)
    bounds, meta = _nodes(wc_min, wc_max)
    with interpret_mode():
        got = trace_bvh.trace_closest_bvh_dense(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d),
            1e-4, np.inf, tile=tile,
        )
    want_tri, want_t = _brute_force(tris, o, d, 1e-4, np.inf)
    got_tri = np.asarray(got["tri"])
    got_t = np.asarray(got["t"])
    np.testing.assert_array_equal(got_tri < 0, want_tri < 0)
    sel = want_tri >= 0
    np.testing.assert_allclose(got_t[sel], want_t[sel], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got_tri[sel], want_tri[sel])


def test_dense_any_matches_brute_force():
    tris, wc_min, wc_max = _random_scene(n_clusters=5, seed=3)
    o, d = _rays(4, trace.TILE * 2)
    packed = trace_pallas.pack_tris(tris)
    bounds, meta = _nodes(wc_min, wc_max)
    t_max = 6.0
    with interpret_mode():
        occ = trace_bvh.trace_any_bvh_dense(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d),
            0.1, t_max, tile=128,
        )
    want_tri, _ = _brute_force(tris, o, d, 0.1, t_max)
    np.testing.assert_array_equal(np.asarray(occ), want_tri >= 0)


def test_dense_closest_skip_mask_and_perm():
    """Culled clusters are excluded (two-phase culling parity with the
    stack kernel's mask_ref) and the fused ray sort returns results in
    SORTED order, matching trace_closest_bvh's contract."""
    tris, wc_min, wc_max = _random_scene(n_clusters=6, seed=2)
    o, d = _rays(9, trace.TILE)
    packed = trace_pallas.pack_tris(tris)
    bounds, meta = _nodes(wc_min, wc_max)
    C = packed.shape[0]
    rng = np.random.default_rng(5)
    mask = (rng.random(C) > 0.5).astype(np.int32)
    perm = rng.permutation(o.shape[0]).astype(np.int32)
    with interpret_mode():
        got = trace_bvh.trace_closest_bvh_dense(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d),
            1e-4, np.inf, skip_mask=jnp.asarray(mask),
            perm=jnp.asarray(perm), tile=128,
        )
        want = trace_bvh.trace_closest_bvh(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d),
            1e-4, np.inf, skip_mask=jnp.asarray(mask),
            perm=jnp.asarray(perm), tile=128,
        )
    for k in ("t", "tri", "u", "v"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-6
        )
