"""Ray-primitive intersection math (pure jnp, used by both the XLA
reference tracer and the Pallas kernels).

This replaces the Vulkan RT pipeline's fixed-function triangle/AABB tests
(/root/reference/src/render/RtReference.cpp RT pipeline + BLAS/TLAS,
SURVEY.md §7 "wavefront path tracer"). No backface culling, matching the
reference's RT pipeline defaults.
"""

from __future__ import annotations

import jax.numpy as jnp

_DET_EPS = 1e-10


def moller_trumbore(o, d, v0, e1, e2, t_min, t_max):
    """Batched Möller-Trumbore.

    o, d: (..., 3) rays; v0, e1, e2: (..., 3) triangles (broadcastable
    against the rays). Returns (hit_mask, t, u, v).
    """
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    ok = jnp.abs(det) > _DET_EPS
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * p, axis=-1) * inv
    q = jnp.cross(tvec, e1)
    v = jnp.sum(d * q, axis=-1) * inv
    t = jnp.sum(e2 * q, axis=-1) * inv
    hit = (
        ok
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, t, u, v


def ray_aabb(o, inv_d, bmin, bmax, t_min, t_max):
    """Exact slab test for individual rays. All (...,3) broadcastable.
    Returns hit mask."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    enter = jnp.maximum(jnp.max(tsm, axis=-1), t_min)
    exit_ = jnp.minimum(jnp.min(tbg, axis=-1), t_max)
    return enter <= exit_


def packet_aabb_enter_exit(o_lo, o_hi, d_lo, d_hi, bmin, bmax):
    """Conservative interval-arithmetic slab ENTRY/EXIT distances of a ray
    packet vs AABBs; axes with sign-mixed directions are non-restricting.
    Returns (enter, exit)."""
    pos = d_lo > 0.0
    neg = d_hi < 0.0
    uniform = pos | neg
    inv_a = jnp.where(uniform, 1.0 / jnp.where(uniform, d_hi, 1.0), 0.0)
    inv_b = jnp.where(uniform, 1.0 / jnp.where(uniform, d_lo, 1.0), 0.0)

    lo0 = bmin - o_hi
    hi0 = bmin - o_lo
    lo1 = bmax - o_hi
    hi1 = bmax - o_lo

    def imul_min(alo, ahi, ba, bb):
        return jnp.minimum(
            jnp.minimum(alo * ba, alo * bb), jnp.minimum(ahi * ba, ahi * bb)
        )

    def imul_max(alo, ahi, ba, bb):
        return jnp.maximum(
            jnp.maximum(alo * ba, alo * bb), jnp.maximum(ahi * ba, ahi * bb)
        )

    t_enter_ax = jnp.minimum(
        imul_min(lo0, hi0, inv_a, inv_b), imul_min(lo1, hi1, inv_a, inv_b)
    )
    t_exit_ax = jnp.maximum(
        imul_max(lo0, hi0, inv_a, inv_b), imul_max(lo1, hi1, inv_a, inv_b)
    )
    big = jnp.float32(3e38)
    t_enter_ax = jnp.where(uniform, t_enter_ax, -big)
    t_exit_ax = jnp.where(uniform, t_exit_ax, big)
    # inverted (masked-out) AABBs must never overlap: the interval
    # endpoint min/max above would otherwise normalize min>max boxes
    # into huge valid ones (render/gbuffer._masked_aabbs culling)
    invalid = jnp.any(bmin > bmax, axis=-1)
    return (
        jnp.where(invalid, big, jnp.max(t_enter_ax, axis=-1)),
        jnp.where(invalid, -big, jnp.min(t_exit_ax, axis=-1)),
    )


def packet_aabb_overlap(
    o_lo, o_hi, d_lo, d_hi, bmin, bmax, t_max
):
    """Conservative interval-arithmetic slab test of a ray packet
    (origin box [o_lo,o_hi], direction box [d_lo,d_hi]) against AABBs.

    Never reports 'no overlap' when any contained ray could hit: axes whose
    direction interval spans zero are treated as non-restricting. Shapes:
    packet bounds (..., 3); AABBs (..., 3) broadcastable. Returns bool.
    """
    # interval reciprocal where sign is uniform
    pos = d_lo > 0.0
    neg = d_hi < 0.0
    uniform = pos | neg
    inv_a = jnp.where(uniform, 1.0 / jnp.where(uniform, d_hi, 1.0), 0.0)
    inv_b = jnp.where(uniform, 1.0 / jnp.where(uniform, d_lo, 1.0), 0.0)

    # interval endpoints of (bound - origin)
    lo0 = bmin - o_hi
    hi0 = bmin - o_lo
    lo1 = bmax - o_hi
    hi1 = bmax - o_lo

    def imul_min(alo, ahi, ba, bb):
        return jnp.minimum(
            jnp.minimum(alo * ba, alo * bb), jnp.minimum(ahi * ba, ahi * bb)
        )

    def imul_max(alo, ahi, ba, bb):
        return jnp.maximum(
            jnp.maximum(alo * ba, alo * bb), jnp.maximum(ahi * ba, ahi * bb)
        )

    # entry uses the near bound per sign; take conservative min/max across
    # both bounds (cheap and safe)
    t_enter_ax = jnp.minimum(
        imul_min(lo0, hi0, inv_a, inv_b), imul_min(lo1, hi1, inv_a, inv_b)
    )
    t_exit_ax = jnp.maximum(
        imul_max(lo0, hi0, inv_a, inv_b), imul_max(lo1, hi1, inv_a, inv_b)
    )
    big = jnp.float32(3e38)
    t_enter_ax = jnp.where(uniform, t_enter_ax, -big)
    t_exit_ax = jnp.where(uniform, t_exit_ax, big)
    # a zero-spanning axis cannot restrict unless the origin box is fully
    # outside the slab and can never move in; conservatively keep it open
    enter = jnp.max(t_enter_ax, axis=-1)
    exit_ = jnp.min(t_exit_ax, axis=-1)
    # inverted (masked-out) AABBs never overlap (see packet_aabb_enter_exit)
    valid = jnp.all(bmin <= bmax, axis=-1)
    return valid & (enter <= exit_) & (exit_ >= 0.0) & (enter <= t_max)


def packet_aabb_overlap_2d(o_lo, o_hi, d_lo, d_hi, bmin, bmax, t_max):
    """packet_aabb_overlap for the (packets x AABBs) dense-cull shape,
    computed PER AXIS with (P, A) temps: broadcasting to (P, A, 3) puts
    a 3-wide minor dim on the TPU lane axis, which pads to 128 lanes —
    a 40x memory bloat that made the trivial cull cost 26 ms at
    wavefront scale (275 packets x 766 clusters, v5e round 4).

    o_lo/o_hi/d_lo/d_hi: (P, 3) packet bounds; bmin/bmax: (A, 3);
    t_max: (P,). Returns (P, A) bool, same semantics as
    packet_aabb_overlap.
    """
    big = jnp.float32(3e38)
    P = o_lo.shape[0]
    A = bmin.shape[0]
    enter = jnp.full((P, A), -big, jnp.float32)
    exit_ = jnp.full((P, A), big, jnp.float32)
    for ax in range(3):
        dlo = d_lo[:, ax:ax + 1]
        dhi = d_hi[:, ax:ax + 1]
        olo = o_lo[:, ax:ax + 1]
        ohi = o_hi[:, ax:ax + 1]
        bmn = bmin[None, :, ax]
        bmx = bmax[None, :, ax]
        pos = dlo > 0.0
        neg = dhi < 0.0
        uniform = pos | neg
        inv_a = jnp.where(uniform, 1.0 / jnp.where(uniform, dhi, 1.0), 0.0)
        inv_b = jnp.where(uniform, 1.0 / jnp.where(uniform, dlo, 1.0), 0.0)
        lo0 = bmn - ohi
        hi0 = bmn - olo
        lo1 = bmx - ohi
        hi1 = bmx - olo

        def imul_min(alo, ahi, ba, bb):
            return jnp.minimum(
                jnp.minimum(alo * ba, alo * bb),
                jnp.minimum(ahi * ba, ahi * bb),
            )

        def imul_max(alo, ahi, ba, bb):
            return jnp.maximum(
                jnp.maximum(alo * ba, alo * bb),
                jnp.maximum(ahi * ba, ahi * bb),
            )

        en_ax = jnp.minimum(
            imul_min(lo0, hi0, inv_a, inv_b), imul_min(lo1, hi1, inv_a, inv_b)
        )
        ex_ax = jnp.maximum(
            imul_max(lo0, hi0, inv_a, inv_b), imul_max(lo1, hi1, inv_a, inv_b)
        )
        en_ax = jnp.where(uniform, en_ax, -big)
        ex_ax = jnp.where(uniform, ex_ax, big)
        enter = jnp.maximum(enter, en_ax)
        exit_ = jnp.minimum(exit_, ex_ax)
    valid = jnp.all(bmin <= bmax, axis=-1)[None, :]
    return (
        valid
        & (enter <= exit_)
        & (exit_ >= 0.0)
        & (enter <= t_max[:, None])
    )
