"""8-wide BVH traversal kernels (ops/trace_bvh.py wide variants) vs
brute force and vs the BVH2 kernels, in interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from prosper_tpu.accel.bvh import build_bvh, pack_nodes8
from prosper_tpu.ops import trace, trace_bvh, trace_pallas
from tests.test_trace import _random_scene, _brute_force
from tests.test_trace_bvh import interpret_mode


def _nodes8(wc_min, wc_max):
    bvh = build_bvh(np.asarray(wc_min), np.asarray(wc_max), max_leaf_size=1)
    return jnp.asarray(pack_nodes8(bvh))


def test_pack_nodes8_structure():
    rng = np.random.default_rng(0)
    c = rng.uniform(-5, 5, (37, 3)).astype(np.float32)
    e = rng.uniform(0.1, 1.0, (37, 3)).astype(np.float32)
    bvh = build_bvh(c - e, c + e, max_leaf_size=1)
    nodes8 = pack_nodes8(bvh)
    assert nodes8.ndim == 3 and nodes8.shape[1:] == (8, 8)
    enc = nodes8[..., 6]
    # every leaf cluster appears exactly once
    leaves = -enc[enc < 0] - 1
    assert sorted(leaves.astype(int).tolist()) == list(range(37))
    # internal children point at valid nodes (and never back at the root)
    internal = enc[(enc > 0)]
    assert internal.max() < len(nodes8)
    # empty slots: NaN bounds (slab comparisons can never pass)
    empty = enc == 0
    empty[0, 0] = False  # root's first slot is real
    assert np.isnan(nodes8[..., 0][empty]).all()


@pytest.mark.parametrize("seed", [0, 7])
def test_bvh8_closest_matches_brute_force(seed):
    tris, wc_min, wc_max = _random_scene(n_clusters=6, seed=seed)
    rng = np.random.default_rng(seed + 1)
    R = trace.TILE * 2
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    packed = trace_pallas.pack_tris(tris)
    nodes8 = _nodes8(wc_min, wc_max)
    with interpret_mode():
        got = trace_bvh.trace_closest_bvh8(
            packed, nodes8, jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf
        )
    want_tri, want_t = _brute_force(tris, o, d, 1e-4, np.inf)

    got_tri = np.asarray(got["tri"])
    got_t = np.asarray(got["t"])
    np.testing.assert_array_equal(got_tri < 0, want_tri < 0)
    sel = want_tri >= 0
    np.testing.assert_allclose(got_t[sel], want_t[sel], rtol=1e-5, atol=1e-6)


def test_bvh8_closest_single_cluster_root_leaf():
    tris, wc_min, wc_max = _random_scene(n_clusters=1, seed=5)
    rng = np.random.default_rng(6)
    R = trace.TILE
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    packed = trace_pallas.pack_tris(tris)
    nodes8 = _nodes8(wc_min, wc_max)
    with interpret_mode():
        got = trace_bvh.trace_closest_bvh8(
            packed, nodes8, jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf
        )
    want_tri, _ = _brute_force(tris, o, d, 1e-4, np.inf)
    np.testing.assert_array_equal(np.asarray(got["tri"]) < 0, want_tri < 0)


def test_bvh8_closest_finite_tmax_and_dead_rays():
    tris, wc_min, wc_max = _random_scene(n_clusters=4, seed=2)
    rng = np.random.default_rng(3)
    R = trace.TILE * 2
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = np.full((R,), 6.0, np.float32)
    t_max[trace.TILE:] = 0.0

    packed = trace_pallas.pack_tris(tris)
    nodes8 = _nodes8(wc_min, wc_max)
    with interpret_mode():
        got = trace_bvh.trace_closest_bvh8(
            packed, nodes8, jnp.asarray(o), jnp.asarray(d), 1e-4,
            jnp.asarray(t_max),
        )
    want_tri, _ = _brute_force(tris, o, d, 1e-4, 6.0)
    got_tri = np.asarray(got["tri"])
    live = np.arange(R) < trace.TILE
    np.testing.assert_array_equal(got_tri[live] < 0, want_tri[live] < 0)
    assert (got_tri[~live] < 0).all()


def test_bvh8_any_matches_brute_force():
    tris, wc_min, wc_max = _random_scene(n_clusters=5, seed=3)
    rng = np.random.default_rng(4)
    R = trace.TILE
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = 6.0

    packed = trace_pallas.pack_tris(tris)
    nodes8 = _nodes8(wc_min, wc_max)
    with interpret_mode():
        occ = trace_bvh.trace_any_bvh8(
            packed, nodes8, jnp.asarray(o), jnp.asarray(d), 0.1, t_max
        )
    want_tri, _ = _brute_force(tris, o, d, 0.1, t_max)
    np.testing.assert_array_equal(np.asarray(occ), want_tri >= 0)


def test_bvh8_full_matches_bvh2_full():
    """Fused-attribute 8-wide kernel returns the BVH2 fused kernel's
    exact rows (same closest hit, same interpolation)."""
    from prosper_tpu.accel.bvh import pack_nodes
    from prosper_tpu.ops.trace_pallas_full import pack_tris_full
    from prosper_tpu.testing import make_test_scene

    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    packed_full = pack_tris_full(
        {k: jnp.asarray(v) for k, v in static.items() if k != "materials"},
        {k: jnp.asarray(v) for k, v in frame.items() if k != "lights"},
        dtype=jnp.float32,  # exact-parity test; f16 covered separately
    )
    wc_min, wc_max = frame["wc_aabb_min_w"], frame["wc_aabb_max_w"]
    bvh = build_bvh(np.asarray(wc_min), np.asarray(wc_max), max_leaf_size=1)
    bounds, meta = pack_nodes(bvh)
    nodes8 = jnp.asarray(pack_nodes8(bvh))

    rng = np.random.default_rng(11)
    R = trace.TILE
    o = rng.uniform(-5, 5, (R, 3)).astype(np.float32)
    o[:, 1] += 1.0
    target = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    with interpret_mode():
        wide = trace_bvh.trace_closest_bvh8_full(
            packed_full, nodes8, jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf
        )
        narrow = trace_bvh.trace_closest_bvh_full(
            packed_full, jnp.asarray(bounds), jnp.asarray(meta),
            jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf,
        )
    for k in wide:
        np.testing.assert_allclose(
            np.asarray(wide[k]), np.asarray(narrow[k]), rtol=1e-6, atol=0,
            err_msg=k,
        )
