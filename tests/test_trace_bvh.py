"""BVH-descent traversal kernels (ops/trace_bvh.py) vs brute force,
in interpret mode on CPU; the same kernels compile for TPU."""

from contextlib import contextmanager
from unittest import mock

import numpy as np
import jax.numpy as jnp
import jax.experimental.pallas as pl
import pytest

from prosper_tpu.accel.bvh import build_bvh, pack_nodes
from prosper_tpu.ops import trace, trace_bvh, trace_pallas
from tests.test_trace import _random_scene, _brute_force


@contextmanager
def interpret_mode():
    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp):
        yield


def _cluster_aabbs(tris, wc_min, wc_max):
    del tris
    return wc_min, wc_max


def _nodes(wc_min, wc_max):
    bvh = build_bvh(np.asarray(wc_min), np.asarray(wc_max), max_leaf_size=1)
    bounds, meta = pack_nodes(bvh)
    return jnp.asarray(bounds), jnp.asarray(meta)


@pytest.mark.parametrize("seed", [0, 7])
def test_bvh_closest_matches_brute_force(seed):
    tris, wc_min, wc_max = _random_scene(n_clusters=6, seed=seed)
    rng = np.random.default_rng(seed + 1)
    R = trace.TILE * 2
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    packed = trace_pallas.pack_tris(tris)
    bounds, meta = _nodes(wc_min, wc_max)
    with interpret_mode():
        got = trace_bvh.trace_closest_bvh(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf
        )
    want_tri, want_t = _brute_force(tris, o, d, 1e-4, np.inf)

    got_tri = np.asarray(got["tri"])
    got_t = np.asarray(got["t"])
    np.testing.assert_array_equal(got_tri < 0, want_tri < 0)
    sel = want_tri >= 0
    np.testing.assert_allclose(got_t[sel], want_t[sel], rtol=1e-5, atol=1e-6)


def test_bvh_closest_single_cluster_root_leaf():
    tris, wc_min, wc_max = _random_scene(n_clusters=1, seed=5)
    rng = np.random.default_rng(6)
    R = trace.TILE
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    packed = trace_pallas.pack_tris(tris)
    bounds, meta = _nodes(wc_min, wc_max)
    with interpret_mode():
        got = trace_bvh.trace_closest_bvh(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf
        )
    want_tri, want_t = _brute_force(tris, o, d, 1e-4, np.inf)
    np.testing.assert_array_equal(np.asarray(got["tri"]) < 0, want_tri < 0)


def test_bvh_closest_finite_tmax_and_dead_rays():
    """Per-ray t_max respected; rays with t_max=0 are inert; tiles of
    only-dead rays don't descend."""
    tris, wc_min, wc_max = _random_scene(n_clusters=4, seed=2)
    rng = np.random.default_rng(3)
    R = trace.TILE * 2
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = np.full((R,), 6.0, np.float32)
    t_max[trace.TILE:] = 0.0  # whole second tile dead

    packed = trace_pallas.pack_tris(tris)
    bounds, meta = _nodes(wc_min, wc_max)
    with interpret_mode():
        got = trace_bvh.trace_closest_bvh(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d), 1e-4,
            jnp.asarray(t_max),
        )
    want_tri, want_t = _brute_force(tris, o, d, 1e-4, 6.0)
    got_tri = np.asarray(got["tri"])
    live = np.arange(R) < trace.TILE
    np.testing.assert_array_equal(got_tri[live] < 0, want_tri[live] < 0)
    assert (got_tri[~live] < 0).all()


def test_bvh_any_matches_brute_force():
    tris, wc_min, wc_max = _random_scene(n_clusters=5, seed=3)
    rng = np.random.default_rng(4)
    R = trace.TILE
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = 6.0

    packed = trace_pallas.pack_tris(tris)
    bounds, meta = _nodes(wc_min, wc_max)
    with interpret_mode():
        occ = trace_bvh.trace_any_bvh(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d), 0.1, t_max
        )
    want_tri, _ = _brute_force(tris, o, d, 0.1, t_max)
    np.testing.assert_array_equal(np.asarray(occ), want_tri >= 0)


def test_bvh_full_skip_mask_culls_clusters():
    """skip_mask: culled clusters' leaves are skipped in-kernel — hits
    equal a brute force over only the visible clusters' triangles
    (draw_list_culler.comp's draw-list analog on the BVH path)."""
    tris, wc_min, wc_max = _random_scene(n_clusters=6, seed=9)
    rng = np.random.default_rng(10)
    R = trace.TILE * 2
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    C = wc_min.shape[0]
    mask = np.ones(C, bool)
    mask[1] = False
    mask[4] = False

    packed = trace_pallas.pack_tris(tris)
    bounds, meta = _nodes(wc_min, wc_max)
    with interpret_mode():
        got = trace_bvh.trace_closest_bvh(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d), 1e-4,
            np.inf, skip_mask=jnp.asarray(mask),
        )

    # brute force over visible clusters only
    pad = trace.CLUSTER_PAD
    vis_tris = {
        k: np.asarray(v).reshape(C, pad, 3)[mask].reshape(-1, 3)
        for k, v in tris.items()
    }
    want_tri_vis, want_t = _brute_force(vis_tris, o, d, 1e-4, np.inf)
    got_tri = np.asarray(got["tri"])
    got_t = np.asarray(got["t"])
    np.testing.assert_array_equal(got_tri < 0, want_tri_vis < 0)
    sel = want_tri_vis >= 0
    np.testing.assert_allclose(got_t[sel], want_t[sel], rtol=1e-5, atol=1e-6)

    # masked clusters never win: map got tri ids back to clusters
    hit_cluster = got_tri[got_tri >= 0] // pad
    assert not np.isin(hit_cluster, np.where(~mask)[0]).any()


def test_bvh_full_matches_plain_and_interpolates():
    """Fused-attribute BVH kernel: t/tri agree with the plain kernel and
    interpolated attributes match manual barycentric interpolation."""
    from prosper_tpu.ops.trace_pallas_full import pack_tris_full
    from prosper_tpu.testing import make_test_scene

    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    packed_full = pack_tris_full(
        {k: jnp.asarray(v) for k, v in static.items() if k != "materials"},
        {k: jnp.asarray(v) for k, v in frame.items() if k != "lights"},
        dtype=jnp.float32,  # exact-parity test; f16 covered separately
    )
    wc_min, wc_max = frame["wc_aabb_min_w"], frame["wc_aabb_max_w"]
    bounds, meta = _nodes(wc_min, wc_max)

    rng = np.random.default_rng(11)
    R = trace.TILE
    o = rng.uniform(-5, 5, (R, 3)).astype(np.float32)
    o[:, 1] += 1.0
    target = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    tris = {
        "v0": jnp.asarray(static["wt_p0"]),
        "e1": jnp.asarray(static["wt_p1"] - static["wt_p0"]),
        "e2": jnp.asarray(static["wt_p2"] - static["wt_p0"]),
    }
    packed_plain = trace_pallas.pack_tris(tris)
    with interpret_mode():
        full = trace_bvh.trace_closest_bvh_full(
            packed_full, bounds, meta, jnp.asarray(o), jnp.asarray(d),
            1e-4, np.inf,
        )
        plain = trace_bvh.trace_closest_bvh(
            packed_plain, bounds, meta, jnp.asarray(o), jnp.asarray(d),
            1e-4, np.inf,
        )

    np.testing.assert_array_equal(
        np.asarray(full["tri"]), np.asarray(plain["tri"])
    )

    sel = np.asarray(full["tri"]) >= 0
    np.testing.assert_allclose(
        np.asarray(full["t"])[sel], np.asarray(plain["t"])[sel], rtol=1e-6
    )

    # manual interpolation of one attribute (uv) for hit rays
    tri = np.asarray(full["tri"])[sel]
    u = np.asarray(plain["u"])[sel]
    v = np.asarray(plain["v"])[sel]
    aidx = static["wt_aidx"][tri]
    ap = static["a_packed"]
    uv0, uv1, uv2 = ap[aidx[:, 0], 7:9], ap[aidx[:, 1], 7:9], ap[aidx[:, 2], 7:9]
    want_uv = (1 - u - v)[:, None] * uv0 + u[:, None] * uv1 + v[:, None] * uv2
    np.testing.assert_allclose(
        np.asarray(full["uv"])[sel], want_uv, rtol=1e-4, atol=1e-5
    )
    mat = np.asarray(full["material"])[sel]
    np.testing.assert_array_equal(mat, static["wt_material"][tri])
