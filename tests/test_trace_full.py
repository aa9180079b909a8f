"""Fused hit+attribute kernel vs the XLA surface-evaluation path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prosper_tpu.ops import trace, trace_pallas_full
from prosper_tpu.render.surface import evaluate_surface, evaluate_surface_from_attrs
from prosper_tpu.ops.texture import pack_material_tables
from prosper_tpu.scene.camera import Camera, CameraParameters, CameraTransform
from prosper_tpu.testing import make_test_scene


def _dev(tree):
    return {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in tree.items()
    }


def test_full_kernel_matches_xla_surface():
    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    static, frame, arena = _dev(static), _dev(frame), _dev(arena)
    arena = dict(arena)
    arena["mat_f32"], arena["mat_i32"] = pack_material_tables(
        static["materials"], arena
    )
    W = H = 32
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    from prosper_tpu.ops.rays import pinhole_rays

    px, py, inv = trace.block_pixel_order(W, H)
    uv = jnp.stack(
        [
            (jnp.asarray(px).astype(jnp.float32) + 0.5) / W,
            (jnp.asarray(py).astype(jnp.float32) + 0.5) / H,
        ],
        -1,
    )
    o, d = pinhole_rays(cam, uv)

    tris = trace.world_triangles(static, frame)
    hit_ref = trace.trace_closest(
        tris, frame["wc_aabb_min_w"], frame["wc_aabb_max_w"], o, d, 1e-4, np.inf
    )
    surf_ref = evaluate_surface(static, frame, arena, o, d, hit_ref)

    # f32 arena: this test asserts exact kernel-logic parity; the
    # f16 default is covered by test_f16_arena_quantization_tolerance
    packed = trace_pallas_full.pack_tris_full(static, frame, dtype=jnp.float32)
    import jax.experimental.pallas as pl
    from unittest import mock

    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp):
        hit_full = trace_pallas_full.trace_closest_full(
            packed, frame["wc_aabb_min_w"], frame["wc_aabb_max_w"], o, d, 1e-4, np.inf
        )
    surf_full = evaluate_surface_from_attrs(arena, o, d, hit_full)

    valid = np.asarray(surf_ref["valid"])
    np.testing.assert_array_equal(np.asarray(surf_full["valid"]), valid)
    np.testing.assert_allclose(
        np.asarray(hit_full["t"])[valid], np.asarray(hit_ref["t"])[valid],
        rtol=1e-5, atol=1e-6,
    )
    for key, tol in [
        ("normal_ws", 1e-4),
        ("uv", 1e-5),
        ("albedo", 1e-5),
        ("roughness", 1e-5),
        ("metallic", 1e-5),
        ("position_ws", 1e-4),
    ]:
        a = np.asarray(surf_full[key])[valid]
        b = np.asarray(surf_ref[key])[valid]
        np.testing.assert_allclose(a, b, atol=tol, err_msg=key)
    np.testing.assert_array_equal(
        np.asarray(surf_full["material"])[valid],
        np.asarray(surf_ref["material"])[valid],
    )


def test_f16_arena_quantization_tolerance():
    """The f16 device-geometry default (TRIS_DTYPE, Mesh.hpp:11-15
    parity) must agree with the f32 arena within quantization tolerance:
    same hit set, t within ~1e-3 relative (f16 mantissa on unit-scale
    scenes)."""
    from prosper_tpu.accel.bvh import build_bvh, pack_nodes
    from prosper_tpu.ops import trace_bvh
    from tests.test_trace_bvh import interpret_mode

    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    st = {k: jnp.asarray(v) for k, v in static.items() if k != "materials"}
    fr = {k: jnp.asarray(v) for k, v in frame.items() if k != "lights"}
    p32 = trace_pallas_full.pack_tris_full(st, fr, dtype=jnp.float32)
    p16 = trace_pallas_full.pack_tris_full(st, fr, dtype=jnp.float16)
    assert p16.dtype == jnp.float16

    bvh = build_bvh(frame["wc_aabb_min_w"], frame["wc_aabb_max_w"],
                    max_leaf_size=1)
    bounds, meta = (jnp.asarray(a) for a in pack_nodes(bvh))
    rng = np.random.default_rng(0)
    R = 512
    o = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    with interpret_mode():
        h32 = trace_bvh.trace_closest_bvh_full(
            p32, bounds, meta, jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf
        )
        h16 = trace_bvh.trace_closest_bvh_full(
            p16, bounds, meta, jnp.asarray(o), jnp.asarray(d), 1e-4, np.inf
        )
    m32 = np.asarray(h32["tri"]) >= 0
    m16 = np.asarray(h16["tri"]) >= 0
    # the hit SET may flip on grazing rays; require near-total agreement
    assert (m32 == m16).mean() > 0.99
    both = m32 & m16
    np.testing.assert_allclose(
        np.asarray(h16["t"])[both], np.asarray(h32["t"])[both],
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(h16["normal"])[both], np.asarray(h32["normal"])[both],
        rtol=2e-2, atol=2e-2,
    )
