"""Geometry-prep hoisting (ops/trace.prepare_geometry): pre-computing the
world-space triangle slabs outside the frame jits must be a pure
refactor — identical images with and without frame["geom"], and the
cache must re-pack when transforms change (the static-BLAS +
per-frame-TLAS pacing of /root/reference/src/scene/World.cpp:749-802).
"""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.ops import trace
from prosper_tpu.testing import make_test_scene


def _dev(d):
    return {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in d.items()
        if k not in ("scene_camera", "bvh_depth")
    }


def test_pt_equal_with_and_without_geom():
    from prosper_tpu.render.pt import pt_render_sample

    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    cam = cam_fn(64, 64)
    s, f, a = _dev(static), _dev(frame), _dev(arena)
    c = {k: jnp.asarray(v) for k, v in cam.items()}

    base = pt_render_sample(s, f, a, c, 64, 64, 0, max_bounces=2)
    f2 = dict(f)
    f2["geom"] = trace.prepare_geometry(
        s, f["transforms"], f["normal_transforms"]
    )
    got = pt_render_sample(s, f2, a, c, 64, 64, 0, max_bounces=2)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_forward_equal_with_and_without_geom():
    from prosper_tpu.render.forward import render_forward

    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    cam = cam_fn(64, 64)
    s, f, a = _dev(static), _dev(frame), _dev(arena)
    c = {k: jnp.asarray(v) for k, v in cam.items()}
    lut = jnp.ones((48, 48, 48, 3), jnp.float32) * 0.5

    base = render_forward(s, f, a, c, lut, 64, 64, 1.0, 1.0, 0, False)
    f2 = dict(f)
    f2["geom"] = trace.prepare_geometry(
        s, f["transforms"], f["normal_transforms"]
    )
    got = render_forward(s, f2, a, c, lut, 64, 64, 1.0, 1.0, 0, False)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got))


def test_geometry_cache_reuses_and_invalidates():
    static, frame, _a, _c = make_test_scene(n_boxes=4)
    s = _dev(static)
    cache = trace.GeometryCache()
    t = frame["transforms"]
    n = frame["normal_transforms"]
    g1 = cache.get(s, t, n)
    g2 = cache.get(s, t, n)
    assert g1 is g2  # same transforms -> no recompute

    t2 = t.copy()
    t2[0, 0, 3] += 1.0  # translate instance 0
    g3 = cache.get(s, t2, n)
    assert g3 is not g1
    v0_moved = np.asarray(g3["tris"]["v0"])
    v0_orig = np.asarray(g1["tris"]["v0"])
    assert not np.allclose(v0_moved, v0_orig)
