"""tile=128 packet variants of the BVH kernels (ops/trace_bvh.py):
incoherent bounce/shadow wavefronts run at half packet width to cut
union-visit waste (trace.BOUNCE_TILE). Results must be identical to the
default 256-ray packets — the packet size is a scheduling choice, not a
semantic one."""

import numpy as np
import jax.numpy as jnp
import pytest

from prosper_tpu.ops import trace, trace_bvh, trace_pallas
from tests.test_trace import _random_scene
from tests.test_trace_bvh import _nodes, interpret_mode


@pytest.mark.parametrize("seed", [0, 3])
def test_closest_tile128_matches_tile256(seed):
    tris, wc_min, wc_max = _random_scene(n_clusters=6, seed=seed)
    rng = np.random.default_rng(seed + 1)
    R = 2048  # TILES_PER_STEP * 128 * 2
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    packed = trace_pallas.pack_tris(tris)
    bounds, meta = _nodes(wc_min, wc_max)
    with interpret_mode():
        base = trace_bvh.trace_closest_bvh(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf
        )
        got = trace_bvh.trace_closest_bvh(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d), 1e-4,
            np.inf, tile=128,
        )
    for k in ("t", "tri", "u", "v"):
        np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(got[k]))


def test_any_tile128_matches_tile256():
    tris, wc_min, wc_max = _random_scene(n_clusters=5, seed=2)
    rng = np.random.default_rng(9)
    R = 1024
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = rng.uniform(0.5, 30.0, (R,)).astype(np.float32)

    packed = trace_pallas.pack_tris(tris)
    bounds, meta = _nodes(wc_min, wc_max)
    with interpret_mode():
        base = trace_bvh.trace_any_bvh(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d), 0.1,
            jnp.asarray(tmax),
        )
        got = trace_bvh.trace_any_bvh(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d), 0.1,
            jnp.asarray(tmax), tile=128,
        )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_closest_full_tile128_matches_tile256():
    from prosper_tpu.ops.trace_pallas_full import pack_tris_full
    from prosper_tpu.testing import make_test_scene

    static, frame, _a, _c = make_test_scene(n_boxes=6)
    s = {k: jnp.asarray(v) for k, v in static.items() if k != "materials"}
    f = {
        k: jnp.asarray(v)
        for k, v in frame.items()
        if k not in ("scene_camera", "bvh_depth", "lights")
    }
    packed = pack_tris_full(s, f)
    bounds, meta = jnp.asarray(frame["bvh_bounds"]), jnp.asarray(
        frame["bvh_meta"]
    )
    rng = np.random.default_rng(4)
    R = 1024
    o = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    with interpret_mode():
        base = trace_bvh.trace_closest_bvh_full(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf
        )
        got = trace_bvh.trace_closest_bvh_full(
            packed, bounds, meta, jnp.asarray(o), jnp.asarray(d), 1e-4,
            np.inf, tile=128,
        )
    # hit selection must be exact; the barycentric attr interpolation may
    # differ by 1 ulp between packet widths (the tile=128 row-skip path
    # interpolates on (8, 128) row groups, and XLA contracts the FMA
    # chain differently at that shape)
    for k in ("t", "tri", "material", "tri_lod"):
        np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(got[k]))
    for k in ("normal", "tangent", "uv"):
        sel = np.asarray(base["tri"]) >= 0
        np.testing.assert_allclose(
            np.asarray(got[k])[sel], np.asarray(base[k])[sel],
            rtol=0, atol=1e-6,
        )


def test_bounce_tile_policy_is_semantics_free():
    """pt at BOUNCE_TILE=128 equals the dense XLA reference (CPU path is
    tile-independent; this pins the policy constant's existence)."""
    assert trace.BOUNCE_TILE in (128, 256)
