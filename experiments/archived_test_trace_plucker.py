"""Plücker MXU intersection block: parity vs the Möller-Trumbore block.

Same (hit, t, u, v) contract as `trace_pallas._moller_block`
(reference triangle test: hardware ray queries in
/root/reference/src/render/RtReference.cpp). The Plücker block computes
the same barycentrics/t from precomputed per-triangle feature rows, so
with HIGHEST matmul precision the results must agree to fp32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp

from prosper_tpu.ops.trace_pallas import _moller_block
from prosper_tpu.ops.trace_plucker import (
    PLU_ROWS,
    _plucker_block,
    plucker_rows_from_slab,
)


def _random_case(seed, n_rays=64, n_tris=128):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-2, 2, (n_tris, 3)).astype(np.float32)
    e1 = rng.uniform(-1.5, 1.5, (n_tris, 3)).astype(np.float32)
    e2 = rng.uniform(-1.5, 1.5, (n_tris, 3)).astype(np.float32)
    slab = np.stack(
        [
            v0[:, 0], v0[:, 1], v0[:, 2],
            e1[:, 0], e1[:, 1], e1[:, 2],
            e2[:, 0], e2[:, 1], e2[:, 2],
        ]
    )  # (9, T)
    # rays aimed near the triangle cloud so a good fraction hit
    o = rng.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(slab), jnp.asarray(o), jnp.asarray(d)


def test_plucker_matches_moller():
    for seed in range(4):
        slab, o, d = _random_case(seed)
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        t_upper = jnp.full_like(ox, 100.0)

        hit_m, t_m, u_m, v_m = _moller_block(
            slab, ox, oy, oz, dx, dy, dz, 1e-4, t_upper
        )
        rows = plucker_rows_from_slab(slab)
        assert rows.shape == (PLU_ROWS, slab.shape[1])
        hit_p, t_p, u_p, v_p = _plucker_block(
            rows, ox, oy, oz, dx, dy, dz, 1e-4, t_upper,
            precision=jax.lax.Precision.HIGHEST,
        )

        hm = np.asarray(hit_m)
        hp = np.asarray(hit_p)
        # identical hit sets up to borderline u/v/t boundary cases
        disagree = hm != hp
        if disagree.any():
            # any disagreement must be within epsilon of a boundary
            u = np.asarray(u_m)[disagree]
            v = np.asarray(v_m)[disagree]
            near_edge = (
                (np.abs(u) < 1e-4)
                | (np.abs(v) < 1e-4)
                | (np.abs(u + v - 1.0) < 1e-4)
            )
            assert near_edge.all(), (
                f"seed {seed}: {disagree.sum()} non-boundary disagreements"
            )
        both = hm & hp
        assert both.sum() > 50, "cases must exercise real hits"
        np.testing.assert_allclose(
            np.asarray(t_m)[both], np.asarray(t_p)[both], rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(u_m)[both], np.asarray(u_p)[both], rtol=3e-3, atol=3e-3
        )
        np.testing.assert_allclose(
            np.asarray(v_m)[both], np.asarray(v_p)[both], rtol=3e-3, atol=3e-3
        )


def test_plucker_miss_is_inf():
    slab, o, d = _random_case(9)
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    # aim away from everything
    dx = jnp.zeros_like(ox)
    dy = jnp.zeros_like(ox)
    dz = jnp.full_like(ox, -1.0)
    o_far = jnp.full_like(ox, 50.0)
    rows = plucker_rows_from_slab(slab)
    hit, t, _, _ = _plucker_block(
        rows, o_far, o_far, o_far, dx, dy, dz, 1e-4, jnp.full_like(ox, 1e9),
        precision=jax.lax.Precision.HIGHEST,
    )
    assert not bool(np.asarray(hit).any())
    assert np.isinf(np.asarray(t)).all()
