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
