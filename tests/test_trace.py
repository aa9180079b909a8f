"""Traversal correctness: tiled cluster tracing vs brute-force Möller."""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.ops import trace
from prosper_tpu.ops.intersect import moller_trumbore


def _random_scene(n_clusters=4, seed=0):
    """Random triangle soup padded into cluster slabs."""
    rng = np.random.default_rng(seed)
    S = n_clusters * trace.CLUSTER_PAD
    v0 = np.zeros((S, 3), np.float32)
    e1 = np.zeros((S, 3), np.float32)
    e2 = np.zeros((S, 3), np.float32)
    wc_min = np.zeros((n_clusters, 3), np.float32)
    wc_max = np.zeros((n_clusters, 3), np.float32)
    for c in range(n_clusters):
        center = rng.uniform(-4, 4, 3)
        n_real = rng.integers(8, trace.CLUSTER_PAD - 3)
        base = c * trace.CLUSTER_PAD
        a = center + rng.normal(0, 1.0, (n_real, 3))
        b = a + rng.normal(0, 0.5, (n_real, 3))
        d = a + rng.normal(0, 0.5, (n_real, 3))
        v0[base : base + n_real] = a
        e1[base : base + n_real] = b - a
        e2[base : base + n_real] = d - a
        pts = np.concatenate([a, b, d])
        wc_min[c] = pts.min(axis=0)
        wc_max[c] = pts.max(axis=0)
    return (
        {"v0": jnp.asarray(v0), "e1": jnp.asarray(e1), "e2": jnp.asarray(e2)},
        jnp.asarray(wc_min),
        jnp.asarray(wc_max),
    )


def _brute_force(tris, o, d, t_min, t_max):
    hit, t, u, v = moller_trumbore(
        np.asarray(o)[:, None, :],
        np.asarray(d)[:, None, :],
        np.asarray(tris["v0"])[None],
        np.asarray(tris["e1"])[None],
        np.asarray(tris["e2"])[None],
        t_min,
        t_max,
    )
    t = np.where(np.asarray(hit), np.asarray(t), np.inf)
    best = np.argmin(t, axis=1)
    bt = t[np.arange(len(best)), best]
    return np.where(np.isfinite(bt), best, -1), bt


def test_trace_closest_matches_brute_force():
    tris, wc_min, wc_max = _random_scene()
    rng = np.random.default_rng(1)
    R = trace.TILE * 2
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    hit = trace.trace_closest(
        tris, wc_min, wc_max, jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf
    )
    want_tri, want_t = _brute_force(tris, o, d, 1e-4, np.inf)

    got_tri = np.asarray(hit["tri"])
    got_t = np.asarray(hit["t"])
    # Same hit triangle (modulo exact ties) and same t
    miss = want_tri < 0
    np.testing.assert_array_equal(got_tri < 0, miss)
    sel = ~miss
    np.testing.assert_allclose(got_t[sel], want_t[sel], rtol=1e-5, atol=1e-6)
    # allow differing tri index only for equal-t ties
    diff = sel & (got_tri != want_tri)
    assert np.allclose(got_t[diff], want_t[diff], rtol=1e-5)


def test_trace_any_matches_brute_force():
    tris, wc_min, wc_max = _random_scene(seed=3)
    rng = np.random.default_rng(4)
    R = trace.TILE
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = 5.0

    occluded = trace.trace_any(
        tris, wc_min, wc_max, jnp.asarray(o), jnp.asarray(d), 1e-4, t_max
    )
    want_tri, _ = _brute_force(tris, o, d, 1e-4, t_max)
    np.testing.assert_array_equal(np.asarray(occluded), want_tri >= 0)


def test_coherent_tile_rays():
    """Primary-like rays from one origin through a grid."""
    tris, wc_min, wc_max = _random_scene(n_clusters=8, seed=7)
    R = trace.TILE
    o = np.tile(np.array([0, 0, 12.0], np.float32), (R, 1))
    xs = np.linspace(-0.4, 0.4, 16)
    dirs = np.stack(
        [np.repeat(xs, 16), np.tile(xs, 16), -np.ones(R)], axis=1
    ).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    hit = trace.trace_closest(
        tris, wc_min, wc_max, jnp.asarray(o), jnp.asarray(dirs), 1e-4, np.inf
    )
    want_tri, want_t = _brute_force(tris, o, dirs, 1e-4, np.inf)
    got_t = np.asarray(hit["t"])
    sel = want_tri >= 0
    np.testing.assert_array_equal(np.asarray(hit["tri"]) >= 0, sel)
    np.testing.assert_allclose(got_t[sel], want_t[sel], rtol=1e-5, atol=1e-6)


def test_permute16_matches_per_pixel_inverse():
    """Segment-level block<->row-major permutation == the per-pixel
    inverse permutation it replaced."""
    import numpy as np
    import jax.numpy as jnp

    from prosper_tpu.ops.trace import (
        block_inverse16,
        block_pixel_order,
        permute16,
    )

    W, H = 64, 48
    _, _, inv = block_pixel_order(W, H)
    inv16 = jnp.asarray(block_inverse16(W, H))
    rng = np.random.default_rng(0)
    a = rng.random((W * H, 5)).astype(np.float32)
    want = a[inv]
    got = np.asarray(permute16(jnp.asarray(a), inv16))
    assert np.array_equal(got, want)
