"""In-kernel primary ray generation (trace_bvh.trace_primary_bvh_full)
vs the XLA prep path (prng jitter + pinhole_rays + trace_closest_bvh_full),
in interpret mode on CPU; the same kernel compiles for TPU."""

from unittest import mock

import numpy as np
import jax.numpy as jnp
import jax.experimental.pallas as pl

from prosper_tpu.mathx import rng as prng
from prosper_tpu.ops import trace, trace_bvh, trace_pallas_full
from prosper_tpu.ops.rays import pinhole_rays
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


_ORIG_PALLAS_CALL = pl.pallas_call


def _interp(*a, **k):
    k.setdefault("interpret", True)
    return _ORIG_PALLAS_CALL(*a, **k)


def test_primary_raygen_matches_xla_prep():
    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    static, frame = _dev(static), _dev(frame)
    W = H = 48  # 9 tiles -> exercises the step pad (-9 % 8 = 7 pad tiles)
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    frame_index = 3

    px_np, py_np, _ = trace.block_pixel_order(W, H)
    px, py = jnp.asarray(px_np), jnp.asarray(py_np)

    # reference: XLA-side jitter + pinhole rays + prepacked-ray kernel
    state = prng.make_state(px, py, jnp.uint32(frame_index))
    _, jitter = prng.rnd2d01(state)
    uv = (jnp.stack([px, py], -1).astype(jnp.float32) + jitter) / jnp.array(
        [W, H], jnp.float32
    )
    o, d = pinhole_rays(cam, uv)

    packed = trace_pallas_full.pack_tris_full(static, frame, dtype=jnp.float32)
    bounds, meta = trace.frame_bvh(frame)
    with mock.patch.object(trace_bvh.pl, "pallas_call", _interp):
        want = trace_bvh.trace_closest_bvh_full(
            packed, bounds, meta, o, d, 0.0, jnp.inf
        )
        cols_np, rows_np, R0 = trace_bvh.pack_pixels_np(px_np, py_np)
        got16 = trace_bvh.trace_primary_bvh_full(
            packed,
            bounds,
            meta,
            jnp.asarray(cols_np),
            jnp.asarray(rows_np),
            trace_bvh.primary_cam_vec(cam, W, H),
            jnp.array([[frame_index, 0, 0, 0]], jnp.int32),
        )
    got = trace_bvh.unpack_hit16(got16[:R0])

    want_tri = np.asarray(want["tri"])
    got_tri = np.asarray(got["tri"])
    # the in-kernel jitter is bit-parity pcg3d, so hits agree exactly
    np.testing.assert_array_equal(got_tri, want_tri)
    sel = want_tri >= 0
    assert sel.any()
    np.testing.assert_allclose(
        np.asarray(got["t"])[sel], np.asarray(want["t"])[sel],
        rtol=1e-5, atol=1e-6,
    )
    for key in ("normal", "uv", "material"):
        np.testing.assert_allclose(
            np.asarray(got[key])[sel], np.asarray(want[key])[sel],
            rtol=1e-4, atol=1e-5,
        )
    # rays past R0 (pt-level pad) come back as dead misses
    assert (np.asarray(got16[R0:, 1]) == -1.0).all()
    assert (np.asarray(got16[R0:, 0]) == 0.0).all()


def test_primary_raygen_taa_jitter_matches_gbuffer_rays():
    """pixel_jitter mode: pixel centers + the per-frame TAA scalar
    jitter (render/gbuffer.py uv_j) folded into the camera uniforms."""
    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    static, frame = _dev(static), _dev(frame)
    W = H = 48
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    jit = jnp.array([0.31 / W, -0.22 / H], jnp.float32)  # NDC jitter

    px_np, py_np, _ = trace.block_pixel_order(W, H)
    uv = (
        jnp.stack([jnp.asarray(px_np), jnp.asarray(py_np)], -1).astype(
            jnp.float32
        )
        + 0.5
    ) / jnp.array([W, H], jnp.float32)
    o, d = pinhole_rays(cam, uv + jit * jnp.array([0.5, -0.5]))

    packed = trace_pallas_full.pack_tris_full(static, frame, dtype=jnp.float32)
    bounds, meta = trace.frame_bvh(frame)
    with mock.patch.object(trace_bvh.pl, "pallas_call", _interp):
        want = trace_bvh.trace_closest_bvh_full(
            packed, bounds, meta, o, d, 0.0, jnp.inf
        )
        cols_np, rows_np, R0 = trace_bvh.pack_pixels_np(px_np, py_np)
        got16 = trace_bvh.trace_primary_bvh_full(
            packed,
            bounds,
            meta,
            jnp.asarray(cols_np),
            jnp.asarray(rows_np),
            trace_bvh.primary_cam_vec(cam, W, H, pixel_jitter=jit),
            jnp.zeros((1, 4), jnp.int32),
        )
    got = trace_bvh.unpack_hit16(got16[:R0])
    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(want["tri"]))
    sel = np.asarray(want["tri"]) >= 0
    assert sel.any()
    np.testing.assert_allclose(
        np.asarray(got["t"])[sel], np.asarray(want["t"])[sel],
        rtol=1e-5, atol=1e-6,
    )
