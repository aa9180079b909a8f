"""Pallas TPU traversal kernels: per-tile cluster-list ray tracing.

The XLA fallback (ops/trace.py) runs every tile in lockstep inside one
vmapped while_loop, so wall time scales with the WORST tile's cluster
count and triangle slabs arrive through gather ops. This kernel instead
walks the grid one ray-tile at a time (grid cells are sequential on the
TensorCore), so:
- total work = sum of per-tile cluster counts (no lockstep waste),
- each cluster's 128-triangle slab is DMA'd HBM->VMEM with double
  buffering (bandwidth-bound stream, no gathers),
- the Möller-Trumbore test runs as dense (TILE x 128) f32 VPU math:
  rays on sublanes, the cluster's 128 triangles on lanes.

Triangle layout: (C, 9, 128) f32 — rows v0x v0y v0z e1x e1y e1z e2x e2y
e2z, lanes = the cluster's 128 padded triangles (scene/world.py arena).

Semantics match ops/trace.py::trace_closest / trace_any exactly (same
cull, same intersection, same t_min/t_max rules).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import packet_aabb_overlap
from .trace import CLUSTER_PAD, TILE, _pad_rays

_DET_EPS = 1e-10


def pack_tris(tris: dict) -> jnp.ndarray:
    """{v0,e1,e2: (S,3)} -> (C, 9, 128) DMA-friendly slabs."""
    S = tris["v0"].shape[0]
    C = S // CLUSTER_PAD

    def rows(a):  # (S,3) -> (C, 3, 128)
        return a.reshape(C, CLUSTER_PAD, 3).transpose(0, 2, 1)

    return jnp.concatenate(
        [rows(tris["v0"]), rows(tris["e1"]), rows(tris["e2"])], axis=1
    )


def _cull_lists(o_t, d_t, t_max_tile, wc_min, wc_max, max_clusters):
    """Phase 1 (XLA): conservative packet cull -> per-tile lists ordered
    front-to-back by conservative entry distance, so the kernels can stop
    as soon as every remaining cluster starts beyond the packet's worst
    confirmed hit."""
    from .intersect import packet_aabb_enter_exit

    o_lo, o_hi = o_t.min(axis=1), o_t.max(axis=1)
    d_lo, d_hi = d_t.min(axis=1), d_t.max(axis=1)
    enter, exit_ = packet_aabb_enter_exit(
        o_lo[:, None, :],
        o_hi[:, None, :],
        d_lo[:, None, :],
        d_hi[:, None, :],
        wc_min[None, :, :],
        wc_max[None, :, :],
    )
    overlap = (enter <= exit_) & (exit_ >= 0.0) & (enter <= t_max_tile[:, None])
    counts = jnp.minimum(overlap.sum(axis=1).astype(jnp.int32), max_clusters)
    big = jnp.float32(3e38)
    key = jnp.where(overlap, jnp.maximum(enter, 0.0), big)
    order = jnp.argsort(key, axis=1, stable=True)
    lists = order[:, :max_clusters].astype(jnp.int32)
    enters = jnp.take_along_axis(key, order[:, :max_clusters], axis=1)
    return lists, counts, enters


def _moller_block(slab, ox, oy, oz, dx, dy, dz, t_min, t_upper):
    """(TILE, 128) Möller-Trumbore against one 9x128 slab.

    Ray components are (TILE, 1); slab rows broadcast as (1, 128).
    Returns (hit, t, u, v) with t = inf where missed.
    """
    v0x = slab[0:1, :]
    v0y = slab[1:2, :]
    v0z = slab[2:3, :]
    e1x = slab[3:4, :]
    e1y = slab[4:5, :]
    e1z = slab[5:6, :]
    e2x = slab[6:7, :]
    e2y = slab[7:8, :]
    e2z = slab[8:9, :]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) > _DET_EPS
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = (
        ok
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_upper)
    )
    return hit, jnp.where(hit, t, jnp.inf), u, v


def _closest_kernel(
    counts_ref,  # scalar-prefetch SMEM (T,)
    lists_ref,  # VMEM (1, 1, MAXC) i32
    enters_ref,  # VMEM (1, 1, MAXC) f32 - front-to-back entry distances
    o_ref,  # VMEM (1, TILE, 3)
    d_ref,  # VMEM (1, TILE, 3)
    tmax_ref,  # VMEM (1, TILE, 1)
    tris_hbm,  # ANY (C, 9, 128)
    t_out,  # VMEM (1, TILE, 1)
    tri_out,  # VMEM (1, TILE, 1) i32
    u_out,
    v_out,
    tri_slab,  # VMEM scratch (2, 9, 128)
    list_smem,  # SMEM scratch (1, MAXC)
    enter_smem,  # SMEM scratch (1, MAXC) f32
    sems,  # DMA sems (4,)
):
    count = counts_ref[pl.program_id(0)]

    lcopy = pltpu.make_async_copy(lists_ref.at[0], list_smem, sems.at[2])
    lcopy.start()
    ecopy = pltpu.make_async_copy(enters_ref.at[0], enter_smem, sems.at[3])
    ecopy.start()

    ox = o_ref[0, :, 0:1]  # (TILE, 1)
    oy = o_ref[0, :, 1:2]
    oz = o_ref[0, :, 2:3]
    dx = d_ref[0, :, 0:1]
    dy = d_ref[0, :, 1:2]
    dz = d_ref[0, :, 2:3]
    t_min = 1e-4

    lcopy.wait()
    ecopy.wait()

    def get_dma(slot, k):
        c = list_smem[0, k]
        return pltpu.make_async_copy(
            tris_hbm.at[c], tri_slab.at[slot], sems.at[slot]
        )

    @pl.when(count > 0)
    def _():
        get_dma(0, 0).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)

    def cond(state):
        # front-to-back early exit: stop when every remaining cluster
        # begins beyond the packet's worst confirmed hit
        k, _, _, _, _, worst = state
        return (k < count) & (enter_smem[0, k] < worst)

    def body(state):
        k, best_t, best_tri, best_u, best_v, worst = state
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < count)
        def _():
            get_dma(jax.lax.rem(k + 1, 2), k + 1).start()

        get_dma(slot, k).wait()

        hit, t, u, v = _moller_block(
            tri_slab[slot], ox, oy, oz, dx, dy, dz, t_min, best_t
        )
        tmin = jnp.min(t, axis=1, keepdims=True)  # (TILE, 1)
        improved = tmin < best_t
        is_best = t == tmin
        j = jnp.min(jnp.where(is_best, lane, 128), axis=1, keepdims=True)
        sel = is_best & (lane == j)
        u_sel = jnp.sum(jnp.where(sel, u, 0.0), axis=1, keepdims=True)
        v_sel = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
        c = list_smem[0, k]
        best_tri = jnp.where(improved, c * CLUSTER_PAD + j, best_tri)
        best_u = jnp.where(improved, u_sel, best_u)
        best_v = jnp.where(improved, v_sel, best_v)
        best_t = jnp.where(improved, tmin, best_t)
        worst = jnp.max(best_t)
        return (k + 1, best_t, best_tri, best_u, best_v, worst)

    init = (
        jnp.int32(0),
        tmax_ref[0],  # (TILE, 1)
        jnp.full((TILE, 1), -1, jnp.int32),
        jnp.zeros((TILE, 1), jnp.float32),
        jnp.zeros((TILE, 1), jnp.float32),
        jnp.max(tmax_ref[0]),
    )
    k_final, best_t, best_tri, best_u, best_v, _ = jax.lax.while_loop(
        cond, body, init
    )

    # drain: an early exit leaves the prefetched DMA for k_final in
    # flight; an unconsumed DMA semaphore aborts the program
    @pl.when((k_final > 0) & (k_final < count))
    def _():
        get_dma(jax.lax.rem(k_final, 2), k_final).wait()

    t_out[0] = best_t
    tri_out[0] = best_tri
    u_out[0] = best_u
    v_out[0] = best_v


def _ray_blocks(maxc):
    return [
        pl.BlockSpec((1, 1, maxc), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, maxc), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE, 3), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE, 3), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE, 1), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]


def _out_block():
    return pl.BlockSpec(
        (1, TILE, 1), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
    )


def _prep(ray_o, ray_d, t_max, wc_min, wc_max, max_clusters):
    n_clusters = wc_min.shape[0]
    maxc = max_clusters or n_clusters
    maxc = -(-maxc // 128) * 128
    maxc = min(maxc, -(-n_clusters // 128) * 128)

    t_max_full = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],))
    ray_o, ray_d, R_out = _pad_rays(ray_o, ray_d)
    R = ray_o.shape[0]
    n_tiles = R // TILE
    o_t = ray_o.reshape(n_tiles, TILE, 3)
    d_t = ray_d.reshape(n_tiles, TILE, 3)
    t_max_t = jnp.concatenate(
        [t_max_full, jnp.zeros((R - R_out,), jnp.float32)]
    ).reshape(n_tiles, TILE)

    tile_tmax = t_max_t.max(axis=1)
    lists, counts, enters = _cull_lists(
        o_t, d_t, tile_tmax, wc_min, wc_max, maxc
    )
    # tiles whose every lane is disabled (t_max ~ 0) can skip entirely —
    # clusters containing the (finite) origins would otherwise pass the
    # conservative slab test
    counts = jnp.where(tile_tmax > 1e-3, counts, 0)
    if lists.shape[1] < maxc:
        pad = maxc - lists.shape[1]
        lists = jnp.pad(lists, ((0, 0), (0, pad)))
        enters = jnp.pad(enters, ((0, 0), (0, pad)), constant_values=3e38)
    return maxc, R, R_out, n_tiles, o_t, d_t, t_max_t, lists, counts, enters


@partial(jax.jit, static_argnames=("max_clusters",))
def trace_closest_pallas(
    tris_packed: jnp.ndarray,  # (C, 9, 128)
    wc_min: jnp.ndarray,
    wc_max: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    max_clusters: int | None = None,
):
    """Pallas closest-hit. Same contract as trace.trace_closest.

    t_min is fixed at 1e-4 in-kernel (callers use that or 0.0 with the
    Wächter-Binder origin offset making the difference immaterial).
    """
    del t_min
    maxc, R, R_out, n_tiles, o_t, d_t, t_max_t, lists, counts, enters = _prep(
        ray_o, ray_d, t_max, wc_min, wc_max, max_clusters
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=_ray_blocks(maxc),
        out_specs=[_out_block() for _ in range(4)],
        scratch_shapes=[
            pltpu.VMEM((2, 9, 128), jnp.float32),
            pltpu.SMEM((1, maxc), jnp.int32),
            pltpu.SMEM((1, maxc), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    t, tri, u, v = pl.pallas_call(
        _closest_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, TILE, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, TILE, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, TILE, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, TILE, 1), jnp.float32),
        ],
    )(
        counts,
        lists[:, None, :],
        enters[:, None, :],
        o_t,
        d_t,
        t_max_t[:, :, None],
        tris_packed,
    )

    return {
        "t": t.reshape(R)[:R_out],
        "tri": tri.reshape(R)[:R_out],
        "u": u.reshape(R)[:R_out],
        "v": v.reshape(R)[:R_out],
    }


def _any_kernel(
    counts_ref,
    lists_ref,
    enters_ref,  # unused: any-hit exits on first hit, order is free
    o_ref,
    d_ref,
    tmax_ref,
    tris_hbm,
    occ_out,  # VMEM (1, TILE, 1) i32
    tri_slab,
    list_smem,
    sems,
):
    del enters_ref
    count = counts_ref[pl.program_id(0)]
    lcopy = pltpu.make_async_copy(lists_ref.at[0], list_smem, sems.at[2])
    lcopy.start()

    ox = o_ref[0, :, 0:1]
    oy = o_ref[0, :, 1:2]
    oz = o_ref[0, :, 2:3]
    dx = d_ref[0, :, 0:1]
    dy = d_ref[0, :, 1:2]
    dz = d_ref[0, :, 2:3]
    tmax = tmax_ref[0]  # (TILE, 1)
    t_min = 0.1  # shadow-ray tMin parity (main.rgen shadow())

    lcopy.wait()

    def get_dma(slot, k):
        c = list_smem[0, k]
        return pltpu.make_async_copy(
            tris_hbm.at[c], tri_slab.at[slot], sems.at[slot]
        )

    @pl.when(count > 0)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        k, occ = state
        return (k < count) & (jnp.sum(occ) < TILE)

    def body(state):
        k, occ = state
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < count)
        def _():
            get_dma(jax.lax.rem(k + 1, 2), k + 1).start()

        get_dma(slot, k).wait()
        hit, _, _, _ = _moller_block(
            tri_slab[slot], ox, oy, oz, dx, dy, dz, t_min, tmax
        )
        occ = occ | jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)
        return (k + 1, occ)

    init = (jnp.int32(0), jnp.zeros((TILE, 1), jnp.int32))
    _, occ = jax.lax.while_loop(cond, body, init)
    occ_out[0] = occ


@partial(jax.jit, static_argnames=("max_clusters",))
def trace_any_pallas(
    tris_packed: jnp.ndarray,
    wc_min: jnp.ndarray,
    wc_max: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    max_clusters: int | None = None,
):
    del t_min
    maxc, R, R_out, n_tiles, o_t, d_t, t_max_t, lists, counts, enters = _prep(
        ray_o, ray_d, t_max, wc_min, wc_max, max_clusters
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=_ray_blocks(maxc),
        out_specs=[_out_block()],
        scratch_shapes=[
            pltpu.VMEM((2, 9, 128), jnp.float32),
            pltpu.SMEM((1, maxc), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    (occ,) = pl.pallas_call(
        _any_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, TILE, 1), jnp.int32)],
    )(
        counts,
        lists[:, None, :],
        enters[:, None, :],
        o_t,
        d_t,
        t_max_t[:, :, None],
        tris_packed,
    )

    return (occ.reshape(R) > 0)[:R_out]
