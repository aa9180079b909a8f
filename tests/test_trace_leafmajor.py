"""Leaf-major pair tracing (ops/trace_leafmajor.py) vs brute force, in
interpret mode on CPU; the same kernel compiles for TPU."""

from contextlib import contextmanager
from unittest import mock

import numpy as np
import jax.numpy as jnp
import jax.experimental.pallas as pl
import pytest

from prosper_tpu.ops import trace, trace_leafmajor, trace_pallas
from tests.test_trace import _random_scene, _brute_force


@contextmanager
def interpret_mode():
    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp):
        yield


def _rays(seed, R):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


@pytest.mark.parametrize("seed", [0, 7])
def test_leafmajor_closest_matches_brute_force(seed):
    tris, wc_min, wc_max = _random_scene(n_clusters=6, seed=seed)
    o, d = _rays(seed + 1, trace.TILE * 2)
    packed = trace_pallas.pack_tris(tris)
    with interpret_mode():
        got = trace_leafmajor.trace_closest_leafmajor(
            packed, jnp.asarray(wc_min), jnp.asarray(wc_max),
            jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf,
        )
    assert not bool(got["_overflow"])
    want_tri, want_t = _brute_force(tris, o, d, 1e-4, np.inf)
    got_tri = np.asarray(got["tri"])
    got_t = np.asarray(got["t"])
    np.testing.assert_array_equal(got_tri < 0, want_tri < 0)
    sel = want_tri >= 0
    np.testing.assert_allclose(got_t[sel], want_t[sel], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got_tri[sel], want_tri[sel])


def test_leafmajor_any_matches_brute_force():
    tris, wc_min, wc_max = _random_scene(n_clusters=5, seed=3)
    o, d = _rays(4, trace.TILE * 2)
    packed = trace_pallas.pack_tris(tris)
    t_max = 6.0
    with interpret_mode():
        occ, overflow = trace_leafmajor.trace_any_leafmajor(
            packed, jnp.asarray(wc_min), jnp.asarray(wc_max),
            jnp.asarray(o), jnp.asarray(d), 1e-4, t_max,
        )
    assert not bool(overflow)
    want_tri, want_t = _brute_force(tris, o, d, 1e-4, t_max)
    np.testing.assert_array_equal(np.asarray(occ), want_tri >= 0)


def test_leafmajor_tmax_respected():
    tris, wc_min, wc_max = _random_scene(n_clusters=4, seed=9)
    o, d = _rays(10, trace.TILE)
    packed = trace_pallas.pack_tris(tris)
    # per-scalar t_max shorter than most hits
    with interpret_mode():
        got = trace_leafmajor.trace_closest_leafmajor(
            packed, jnp.asarray(wc_min), jnp.asarray(wc_max),
            jnp.asarray(o), jnp.asarray(d), 1e-4, 2.5,
        )
    want_tri, want_t = _brute_force(tris, o, d, 1e-4, 2.5)
    np.testing.assert_array_equal(np.asarray(got["tri"]) < 0, want_tri < 0)
    sel = want_tri >= 0
    np.testing.assert_allclose(
        np.asarray(got["t"])[sel], want_t[sel], rtol=1e-5, atol=1e-6
    )


def test_enumerate_pairs_counts():
    """Candidate sets must match a numpy slab test exactly."""
    tris, wc_min, wc_max = _random_scene(n_clusters=6, seed=5)
    o, d = _rays(6, 64)
    pr, plf, pv, overflow = trace_leafmajor.enumerate_pairs(
        jnp.asarray(wc_min), jnp.asarray(wc_max),
        jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf,
    )
    assert not bool(overflow)
    inv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    t0 = (wc_min[None] - o[:, None]) * inv[:, None]
    t1 = (wc_max[None] - o[:, None]) * inv[:, None]
    lo = np.minimum(t0, t1).max(-1)
    hi = np.maximum(t0, t1).min(-1)
    want = hi >= np.maximum(lo, 1e-4)
    got = np.zeros_like(want)
    pr, plf, pv = np.asarray(pr), np.asarray(plf), np.asarray(pv)
    got[pr[pv], plf[pv]] = True
    np.testing.assert_array_equal(got, want)


def test_leafmajor_full_matches_packet_kernel():
    """attrs_from_hit must reproduce the fused packet kernel's
    interpolated attribute set exactly (same rows, same blend)."""
    from prosper_tpu.accel.bvh import build_bvh, pack_nodes
    from prosper_tpu.ops import trace_bvh
    from prosper_tpu.ops.trace_pallas_full import pack_tris_full

    tris, wc_min, wc_max = _random_scene(n_clusters=6, seed=2)
    o, d = _rays(11, trace.TILE * 2)

    # pack_tris_full wants the scene dicts; build the 40-row arena from
    # the plain packed rows + synthetic attribute rows instead
    rng = np.random.default_rng(12)
    packed9 = np.asarray(trace_pallas.pack_tris(tris))
    C = packed9.shape[0]
    full = np.zeros((C, 40, 128), np.float32)
    full[:, :9] = packed9
    full[:, 9:38] = rng.random((C, 29, 128), dtype=np.float32)
    full_d = jnp.asarray(full)

    bvh = build_bvh(np.asarray(wc_min), np.asarray(wc_max), max_leaf_size=1)
    bounds, meta = pack_nodes(bvh)

    with interpret_mode():
        want = trace_bvh.trace_closest_bvh_full(
            full_d, jnp.asarray(bounds), jnp.asarray(meta),
            jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf,
        )
        got = trace_leafmajor.trace_closest_leafmajor_full(
            full_d, jnp.asarray(wc_min), jnp.asarray(wc_max),
            jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf,
        )
    np.testing.assert_array_equal(
        np.asarray(got["tri"]), np.asarray(want["tri"])
    )
    sel = np.asarray(want["tri"]) >= 0
    for k in ("t", "normal", "tangent", "uv", "tri_lod"):
        np.testing.assert_allclose(
            np.asarray(got[k])[sel], np.asarray(want[k])[sel],
            rtol=1e-5, atol=1e-5, err_msg=k,
        )
    np.testing.assert_array_equal(
        np.asarray(got["material"])[sel], np.asarray(want["material"])[sel]
    )


def test_pt_frame_leafmajor_matches_packet():
    """Full PT sample with bounce/shadow on the leaf-major tracer must
    match the packet-kernel path (same RNG streams, same closest hits;
    only the traversal strategy differs). Forces the TPU code path in
    interpret mode."""
    import jax

    from prosper_tpu.render import pt
    from prosper_tpu.render.shading import pack_light_table
    from prosper_tpu.testing import make_test_scene

    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    dev = lambda t: {  # noqa: E731
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in t.items()
    }
    static, frame, arena = dev(static), dev(frame), dev(arena)
    from prosper_tpu.ops.texture import pack_material_tables

    arena["mat_f32"], arena["mat_i32"] = pack_material_tables(
        static["materials"], arena
    )
    W = H = 32
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}

    imgs = {}
    with interpret_mode(), mock.patch.object(
        jax, "default_backend", lambda: "tpu"
    ):
        from prosper_tpu import config

        for tracer in ("packet", "leafmajor"):
            config.policy.bounce_tracer = tracer
            jax.clear_caches()
            try:
                imgs[tracer] = np.asarray(
                    pt.pt_render_sample(
                        static, frame, arena, cam, W, H, 3, max_bounces=2
                    )
                )
            finally:
                config.policy.bounce_tracer = "packet"
        jax.clear_caches()
    assert np.isfinite(imgs["packet"]).all()
    assert np.abs(imgs["packet"]).sum() > 0
    np.testing.assert_allclose(
        imgs["leafmajor"], imgs["packet"], rtol=2e-4, atol=2e-5
    )


def test_disabled_rays_emit_no_pairs():
    """Wavefront-disabled rays (t_max = 0) with stale origins INSIDE
    cluster AABBs must not consume pair capacity (review fix: lo < 0
    inside a box used to pass the old `lo < t_max` test)."""
    tris, wc_min, wc_max = _random_scene(n_clusters=6, seed=1)
    centers = (wc_min + wc_max) / 2
    R = 64
    o = np.tile(centers[0][None], (R, 1)).astype(np.float32)  # inside
    d = np.tile(np.array([[1.0, 0, 0]], np.float32), (R, 1))
    t_max = jnp.zeros((R,), jnp.float32)
    _, _, pv, overflow = trace_leafmajor.enumerate_pairs(
        jnp.asarray(wc_min), jnp.asarray(wc_max),
        jnp.asarray(o), jnp.asarray(d), 1e-4, t_max,
    )
    assert not bool(overflow)
    assert int(np.asarray(pv).sum()) == 0


def _overlapping_scene(n_clusters=12, seed=5):
    """All clusters share one spatial region, so every ray through it
    has n_clusters candidate pairs — with n_clusters > PAIR_CAP_PER_RAY
    the dense enumerator MUST overflow."""
    rng = np.random.default_rng(seed)
    S = n_clusters * trace.CLUSTER_PAD
    v0 = np.zeros((S, 3), np.float32)
    e1 = np.zeros((S, 3), np.float32)
    e2 = np.zeros((S, 3), np.float32)
    wc_min = np.zeros((n_clusters, 3), np.float32)
    wc_max = np.zeros((n_clusters, 3), np.float32)
    for c in range(n_clusters):
        n_real = 32
        base = c * trace.CLUSTER_PAD
        a = rng.normal(0, 1.0, (n_real, 3))
        b = a + rng.normal(0, 0.4, (n_real, 3))
        d = a + rng.normal(0, 0.4, (n_real, 3))
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


def test_overflow_safe_exact_agreement():
    """VERDICT r3 item 3: under pair-capacity overflow the *_safe
    tracers must re-trace through the packet BVH kernel and stay EXACT
    (no silently dropped occluders)."""
    from prosper_tpu.accel.bvh import build_bvh, pack_nodes

    tris, wc_min, wc_max = _overlapping_scene()
    assert wc_min.shape[0] > trace_leafmajor.PAIR_CAP_PER_RAY
    o, d = _rays(11, trace.TILE)
    # aim every ray through the shared cluster region so each has a
    # full candidate set
    target = np.asarray((wc_min.min(0) + wc_max.max(0)) / 2.0)
    dd = target[None, :] - o
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    d = dd.astype(np.float32)

    packed = trace_pallas.pack_tris(tris)
    bvh = build_bvh(np.asarray(wc_min), np.asarray(wc_max), max_leaf_size=1)
    bounds, meta = (jnp.asarray(a) for a in pack_nodes(bvh))

    with interpret_mode():
        raw = trace_leafmajor.trace_closest_leafmajor(
            packed, wc_min, wc_max,
            jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf,
        )
        assert bool(raw["_overflow"]), "scene failed to force overflow"
        got = trace_leafmajor.trace_closest_leafmajor_safe(
            packed, bounds, meta, wc_min, wc_max,
            jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf,
        )
        occ = trace_leafmajor.trace_any_leafmajor_safe(
            packed, bounds, meta, wc_min, wc_max,
            jnp.asarray(o), jnp.asarray(d), 1e-4, 4.0,
        )
    want_tri, want_t = _brute_force(tris, o, d, 1e-4, np.inf)
    got_tri = np.asarray(got["tri"])
    np.testing.assert_array_equal(got_tri < 0, want_tri < 0)
    sel = want_tri >= 0
    np.testing.assert_array_equal(got_tri[sel], want_tri[sel])
    np.testing.assert_allclose(
        np.asarray(got["t"])[sel], want_t[sel], rtol=1e-5, atol=1e-6
    )
    want_occ_tri, _ = _brute_force(tris, o, d, 1e-4, 4.0)
    np.testing.assert_array_equal(np.asarray(occ), want_occ_tri >= 0)
