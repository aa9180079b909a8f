"""MXU ray-triangle block intersection (Plücker coordinates).

The VPU Möller block (`trace_pallas._moller_block`) is ~45 vector ops
over (TILE, 128) — it dominates the BVH leaf visit (~2.0 of 2.59 µs,
scripts/bench_insitu.py). The Plücker formulation turns every pairwise
ray×triangle term into a small-K matmul the MXU executes almost for
free, leaving a ~12-op VPU epilogue:

    side_e(ray, tri) = d·(P×Q) + (o×d)·(Q−P)  =  [d|m] @ [g_e|u_e]
        (edge e = (P,Q); g_e, u_e precomputable per triangle)
    Σ_e side_e = d·n  (n = e1×e2) — the plane-equation denominator —
    so barycentrics are sides normalized by ONE reciprocal:
        u = s_CA/den, v = s_AB/den, t = (n·v0 − n·o)/den

Hit iff all three sides share a sign (and t in range). Equivalent to
Möller-Trumbore (same u, v, t); parity asserted in
tests/test_trace_plucker.py and scripts/bench_mxu_isect.py.

Replaces the reference's per-ray hardware RT triangle test
(`src/render/RtReference.cpp` ray queries) on the TPU compute path.
"""

from __future__ import annotations

import jax.numpy as jnp

_DET_EPS = 1e-9

# packed feature-row layout (PLU_ROWS x 128):
#   0:6   [g_AB | u_AB]   side row pair for edge AB
#   6:12  [g_BC | u_BC]
#   12:18 [g_CA | u_CA]
#   18:21 n = e1×e2
#   21    c = n·v0
PLU_ROWS = 22


def _cross_rows(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def plucker_rows_from_slab(slab):
    """(9, 128) v0/e1/e2 slab -> (PLU_ROWS, 128) Plücker feature rows.

    ~30 (1,128) VPU ops; cheap enough to run per leaf visit on the
    geometry slab the DMA just brought in (no extra HBM bytes vs the
    9-row slab).
    """
    v0x, v0y, v0z = slab[0:1], slab[1:2], slab[2:3]
    e1x, e1y, e1z = slab[3:4], slab[4:5], slab[5:6]
    e2x, e2y, e2z = slab[6:7], slab[7:8], slab[8:9]

    # A×B = v0×e1 ; C×A = −v0×e2 ; n = e1×e2
    v0e1 = _cross_rows(v0x, v0y, v0z, e1x, e1y, e1z)
    v0e2 = _cross_rows(v0x, v0y, v0z, e2x, e2y, e2z)
    n = _cross_rows(e1x, e1y, e1z, e2x, e2y, e2z)
    # B×C = v0×e2 − v0×e1 + e1×e2
    g2 = tuple(v0e2[i] - v0e1[i] + n[i] for i in range(3))
    c = n[0] * v0x + n[1] * v0y + n[2] * v0z

    return jnp.concatenate(
        [
            v0e1[0], v0e1[1], v0e1[2], e1x, e1y, e1z,
            g2[0], g2[1], g2[2], e2x - e1x, e2y - e1y, e2z - e1z,
            -v0e2[0], -v0e2[1], -v0e2[2], -e2x, -e2y, -e2z,
            n[0], n[1], n[2],
            c,
        ],
        axis=0,
    )


def _plucker_block(
    rows, ox, oy, oz, dx, dy, dz, t_min, t_upper, precision=None
):
    """(TILE, 128) intersection against one PLU_ROWS×128 feature slab.

    Ray components are (TILE, 1). Returns (hit, t, u, v) with t = inf
    where missed — drop-in for `_moller_block`. precision: None lets the
    MXU run bf16 passes (~1e-2 t error); jax.lax.Precision.HIGHEST runs
    bf16x3 f32 emulation (~1e-6).
    """
    import jax

    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    lhs = jnp.concatenate([dx, dy, dz, mx, my, mz], axis=1)  # (TILE, 6)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )

    # two side matmuls ride the MXU (K=6 per edge); the third side is
    # implicit: s_AB + s_BC + s_CA = d·n = den, so u,v,1-u-v cover it
    s1 = dot(lhs, rows[0:6])
    s3 = dot(lhs, rows[12:18])

    d3 = lhs[:, 0:3]
    o3 = jnp.concatenate([ox, oy, oz], axis=1)
    den = dot(d3, rows[18:21])
    o_n = dot(o3, rows[18:21])

    ok = jnp.abs(den) > _DET_EPS
    inv = jnp.where(ok, 1.0 / jnp.where(ok, den, 1.0), 0.0)
    t = (rows[21:22] - o_n) * inv
    u = s3 * inv
    v = s1 * inv
    # sides sum to den, so same-sign(all) == u,v,1-u-v all >= 0
    hit = (
        ok
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_upper)
    )
    return hit, jnp.where(hit, t, jnp.inf), u, v
