"""Pallas traversal kernels vs the XLA reference path (interpret mode on
CPU; the same kernels compile for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prosper_tpu.ops import trace, trace_pallas
from tests.test_trace import _random_scene, _brute_force


def _run_closest(tris, wc_min, wc_max, o, d, t_max=np.inf):
    packed = trace_pallas.pack_tris(tris)
    with jax.disable_jit(False):
        import jax.experimental.pallas as pl  # noqa

        # interpret mode on CPU
        from unittest import mock

        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        with mock.patch.object(pl, "pallas_call", interp):
            return trace_pallas.trace_closest_pallas(
                packed, wc_min, wc_max, jnp.asarray(o), jnp.asarray(d), 1e-4, t_max
            )


@pytest.mark.parametrize("seed", [0, 7])
def test_pallas_closest_matches_xla(seed):
    tris, wc_min, wc_max = _random_scene(n_clusters=6, seed=seed)
    rng = np.random.default_rng(seed + 1)
    R = trace.TILE * 2
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    got = _run_closest(tris, wc_min, wc_max, o, d)
    want_tri, want_t = _brute_force(tris, o, d, 1e-4, np.inf)

    got_tri = np.asarray(got["tri"])
    got_t = np.asarray(got["t"])
    np.testing.assert_array_equal(got_tri < 0, want_tri < 0)
    sel = want_tri >= 0
    np.testing.assert_allclose(got_t[sel], want_t[sel], rtol=1e-5, atol=1e-6)


def test_pallas_any_matches_xla():
    tris, wc_min, wc_max = _random_scene(n_clusters=5, seed=3)
    rng = np.random.default_rng(4)
    R = trace.TILE
    o = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = 6.0

    packed = trace_pallas.pack_tris(tris)
    import jax.experimental.pallas as pl
    from unittest import mock

    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp):
        occ = trace_pallas.trace_any_pallas(
            packed, wc_min, wc_max, jnp.asarray(o), jnp.asarray(d), 0.1, t_max
        )
    want_tri, _ = _brute_force(tris, o, d, 0.1, t_max)
    np.testing.assert_array_equal(np.asarray(occ), want_tri >= 0)
