"""Leaf-major tracing for incoherent (bounce/shadow) rays.

The packet BVH kernel (ops/trace_bvh.py) amortizes each 128-triangle
leaf visit over a 256-ray packet — great for coherent primary rays, but
hemisphere bounce packets union-visit ~41 leaves while each ray only
needs ~2.6 (scripts/visit_union_analysis.py), so ~94% of the Möller work
shades rays that never wanted the leaf.

This module inverts the loop: enumerate the exact (ray, candidate-leaf)
pairs with ONE dense ray x cluster-AABB slab test (pure VPU math — at
~1k clusters the flat test is cheaper than any tree walk because it has
zero scalar/stack overhead), group the pairs BY LEAF, and run one dense
Möller block per 256 rays that actually want each leaf. Utilization of
the intersection math is then ~the candidate-pair count instead of
packets x union-visits.

Correctness: every candidate leaf (AABB entered within [t_min, t_max])
is tested, so the min-t over pairs is exactly the closest hit — no
early-out is needed (the early-out is what the packet kernel has and
incoherent packets cannot exploit). Replaces the reference's hardware
RT traversal for these ray classes
(/root/reference/src/render/RtReference.cpp:301-527).

Scaling note: the dense enumeration is O(R x C); for cluster counts
beyond ~10k switch enumeration to the BVH kernel's descent (the rest of
the pipeline is unchanged). FlightHelmet is 766 clusters, the stress
scene 4096.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import packet_aabb_overlap_2d
from .trace_pallas import _moller_block

PAIR_CAP_PER_RAY = 8  # pair-capacity headroom vs the ~3.5 mean
BLOCKS_PER_STEP = 8  # pair blocks per grid step (DMA ring rides across)
ENUM_TILE = 256  # rays per enumeration tile (packet-cull granularity)
VIS_CAP = 128  # candidate clusters per tile (conservative packet hull);
# overflowing tiles raise the overflow flag -> exact packet re-trace
_INF = 3e38


def enumerate_pairs(wc_min, wc_max, ray_o, ray_d, t_min, t_max):
    """Dense candidate enumeration: pair (ray r, cluster c) iff ray r
    enters cluster c's AABB within [t_min, t_max(r)].

    Returns (pair_ray (P,), pair_leaf (P,), pair_valid (P,), overflow)
    with P = PAIR_CAP_PER_RAY * R; overflow is True when the candidate
    count exceeded P (pairs were dropped — callers treat it as a
    diagnostic; the cap is ~2.3x the measured p90).
    """
    R = ray_o.shape[0]
    C = wc_min.shape[0]
    inv_d = jnp.where(
        jnp.abs(ray_d) > 1e-12, 1.0 / ray_d, jnp.float32(1e30)
    )
    # LEAF-major mask (C, R): nonzero then emits pair ids already
    # grouped by leaf, so block building needs NO pair sort (an argsort
    # of 8R keys would otherwise dominate the glue at wavefront scale)
    t0 = (wc_min[:, None, :] - ray_o[None, :, :]) * inv_d[None, :, :]
    t1 = (wc_max[:, None, :] - ray_o[None, :, :]) * inv_d[None, :, :]
    lo = jnp.minimum(t0, t1).max(axis=-1)
    hi = jnp.maximum(t0, t1).min(axis=-1)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    # entry = max(lo, t_min): a hit can only land in [entry, t_max), so
    # candidates need entry < t_max — in particular disabled rays
    # (t_max = 0, the wavefront convention) emit NO pairs even when
    # their stale origin sits inside an AABB (lo < 0), which would
    # otherwise waste pair capacity on mostly-dead late-bounce chunks
    entry = jnp.maximum(lo, t_min)
    enter = (hi >= entry) & (entry < t_max_b[None, :])

    P = PAIR_CAP_PER_RAY * R
    flat = enter.reshape(C * R)
    (ids,) = jnp.nonzero(flat, size=P, fill_value=C * R)
    pair_valid = ids < C * R
    pair_leaf = jnp.where(pair_valid, ids // R, C).astype(jnp.int32)
    pair_ray = jnp.where(pair_valid, ids % R, 0).astype(jnp.int32)
    overflow = jnp.sum(flat.astype(jnp.int32)) > P
    return pair_ray, pair_leaf, pair_valid, overflow


def candidate_lists(wc_min, wc_max, ray_o, ray_d, t_min, t_max):
    """Per-ray candidate-cluster lists via a two-level cull — the round-4
    replacement for the dense O(R x C) enumeration above, which at
    wavefront scale (70k rays x 766 clusters) cost ~470 ms in rank-3
    slab temps + a 53.8M-element nonzero (scripts/bench_leafmajor.py).

    Level 1: rays are grouped into 256-ray tiles; a conservative
    interval-arithmetic packet-AABB cull (packet_aabb_overlap_2d, (T, C)
    per-axis temps) bounds each tile's candidate clusters to <= VIS_CAP
    ids. Level 2: the exact per-ray slab test runs only on
    (tile, candidate) — O(R x VIS_CAP) — and each ray's first
    PAIR_CAP_PER_RAY candidate ids are extracted with argmin sweeps
    (an R*V-element jnp.nonzero scatters at ~9 ns/element = 78 ms;
    the sweeps are pure VPU reductions).

    Returns (ray_leaf (Rpad, K) i32 ascending cluster ids, C = empty;
    heavy (Rpad,) bool — rays with MORE than K candidates (their lists
    are truncated; route them to the packet kernel); tile_overflow —
    some tile exceeded VIS_CAP candidates, results untrustworthy).
    Rpad = R rounded up to the 256-ray tile.
    """
    R0 = ray_o.shape[0]
    C = wc_min.shape[0]
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R0,))
    pad = (-R0) % ENUM_TILE
    if pad:
        # padding rays: finite origin (ray 0), zero direction, t_max 0
        # -> never produce a pair, never widen packet bounds unboundedly
        ray_o = jnp.concatenate(
            [ray_o, jnp.broadcast_to(ray_o[:1], (pad, 3))], axis=0
        )
        ray_d = jnp.concatenate([ray_d, jnp.zeros((pad, 3), ray_d.dtype)], 0)
        t_max_b = jnp.concatenate([t_max_b, jnp.zeros((pad,), jnp.float32)])
    R = ray_o.shape[0]
    T = R // ENUM_TILE
    o_t = ray_o.reshape(T, ENUM_TILE, 3)
    d_t = ray_d.reshape(T, ENUM_TILE, 3)
    tm_t = t_max_b.reshape(T, ENUM_TILE)

    # ---- level 1: conservative packet cull -> per-tile candidates ----
    o_lo, o_hi = o_t.min(axis=1), o_t.max(axis=1)
    d_lo, d_hi = d_t.min(axis=1), d_t.max(axis=1)
    overlap = packet_aabb_overlap_2d(
        o_lo, o_hi, d_lo, d_hi, wc_min, wc_max, tm_t.max(axis=1)
    )  # (T, C) — per-axis temps, see packet_aabb_overlap_2d
    cand_count = overlap.sum(axis=1).astype(jnp.int32)
    # candidates first, ascending cluster id within the candidate group
    order = jnp.argsort(~overlap, axis=1, stable=True)
    cand = order[:, :VIS_CAP].astype(jnp.int32)  # (T, V), V=min(VIS_CAP,C)
    V = cand.shape[1]
    cand_ok = jnp.take_along_axis(overlap, order[:, :V], axis=1)
    tile_overflow = jnp.any(cand_count > V)

    # ---- level 2: exact per-ray slab test on (tile, ray, candidate) ----
    cmin = wc_min[cand]  # (T, V, 3)
    cmax = wc_max[cand]
    inv_d = jnp.where(jnp.abs(d_t) > 1e-12, 1.0 / d_t, jnp.float32(1e30))
    lo = jnp.full((T, ENUM_TILE, V), -_INF, jnp.float32)
    hi = jnp.full((T, ENUM_TILE, V), _INF, jnp.float32)
    for ax in range(3):  # per-axis: temps stay (T, 256, V), never rank-4
        t0 = (cmin[:, None, :, ax] - o_t[:, :, None, ax]) * inv_d[:, :, None, ax]
        t1 = (cmax[:, None, :, ax] - o_t[:, :, None, ax]) * inv_d[:, :, None, ax]
        lo = jnp.maximum(lo, jnp.minimum(t0, t1))
        hi = jnp.minimum(hi, jnp.maximum(t0, t1))
    entry = jnp.maximum(lo, jnp.asarray(t_min, jnp.float32))
    enter = (
        (hi >= entry)
        & (entry < tm_t[:, :, None])
        & cand_ok[:, None, :]
    ).reshape(R, V)  # per-ray candidate mask

    # ---- per-ray candidate extraction (no giant nonzero: the scatter
    # inside an R*V-element jnp.nonzero ran at ~9 ns/element = 78 ms at
    # wavefront scale; K argmin sweeps are pure VPU reductions) ----
    K = PAIR_CAP_PER_RAY
    cand_b = jnp.broadcast_to(
        cand[:, None, :], (T, ENUM_TILE, V)
    ).reshape(R, V)
    keys = jnp.where(enter, cand_b, C)  # candidate CLUSTER id (C = none)
    slot = jax.lax.broadcasted_iota(jnp.int32, (R, V), 1)
    ray_leaf = []
    for _ in range(K):
        j = jnp.argmin(keys, axis=1)  # smallest remaining candidate id
        ray_leaf.append(jnp.min(keys, axis=1))
        keys = jnp.where(slot == j[:, None], C, keys)  # no scatters
    ray_leaf = jnp.stack(ray_leaf, axis=1)  # (R, K) ascending, C = empty
    heavy = jnp.min(keys, axis=1) < C  # > K candidates: list truncated
    # tiles whose candidate count exceeded VIS_CAP dropped clusters
    # arbitrarily: ALL their rays go heavy (packet kernel), which keeps
    # the hybrid tracers exact with no global fallback
    heavy = heavy | jnp.repeat(cand_count > V, ENUM_TILE)
    return ray_leaf, heavy, tile_overflow


def pairs_from_lists(ray_leaf, n_clusters):
    """(Rpad, K) candidate lists -> leaf-major pair arrays
    (pair_ray, pair_leaf, pair_valid): ONE argsort of K*Rpad short keys
    groups pairs by leaf for build_blocks (invalid pairs at the tail)."""
    R, K = ray_leaf.shape
    pr = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[:, None], (R, K)
    ).reshape(-1)
    pl = ray_leaf.reshape(-1)
    perm = jnp.argsort(pl, stable=True)
    pair_leaf = pl[perm]
    pair_ray = pr[perm]
    pair_valid = pair_leaf < n_clusters
    return pair_ray, pair_leaf, pair_valid


def enumerate_pairs_tiled(wc_min, wc_max, ray_o, ray_d, t_min, t_max):
    """Tiled candidate enumeration with the enumerate_pairs contract:
    (pair_ray, pair_leaf, pair_valid, overflow). overflow covers BOTH
    per-ray candidate counts beyond PAIR_CAP_PER_RAY and per-tile counts
    beyond VIS_CAP — callers using this contract (the *_safe wrappers)
    re-trace through the packet kernel on overflow. The hybrid tracers
    below handle heavy rays surgically instead."""
    C = wc_min.shape[0]
    ray_leaf, heavy, tile_overflow = candidate_lists(
        wc_min, wc_max, ray_o, ray_d, t_min, t_max
    )
    pair_ray, pair_leaf, pair_valid = pairs_from_lists(ray_leaf, C)
    return pair_ray, pair_leaf, pair_valid, jnp.any(heavy) | tile_overflow


ENUM_MODE = "tiled"  # "tiled" (two-level cull) or "dense" (O(R x C))


def _enumerate(wc_min, wc_max, ray_o, ray_d, t_min, t_max):
    if ENUM_MODE == "tiled":
        return enumerate_pairs_tiled(
            wc_min, wc_max, ray_o, ray_d, t_min, t_max
        )
    return enumerate_pairs(wc_min, wc_max, ray_o, ray_d, t_min, t_max)


def build_blocks(pair_ray, pair_leaf, pair_valid, n_clusters):
    """Group pairs by leaf into dense 256-ray blocks.

    Returns (block_leaf (B,), slot_ray (B, 256), slot_valid (B, 256),
    pair_block (P,), pair_slot (P,)) where B = P//256 + n_clusters
    (worst-case partial blocks)."""
    P = pair_ray.shape[0]
    B = P // 256 + n_clusters

    # enumerate_pairs emits pairs already grouped by leaf (leaf-major
    # mask), invalid pairs at the tail (nonzero fill) — no sort needed
    leaf_s = jnp.where(pair_valid, pair_leaf, jnp.int32(n_clusters))
    ray_s = pair_ray
    valid_s = pair_valid

    idx = jnp.arange(P, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), leaf_s[1:] != leaf_s[:-1]]
    )
    # within-leaf rank: idx - start_of_my_segment
    seg_start = jnp.where(is_start, idx, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    w = idx - seg_start
    # blocks before my segment: each earlier segment contributes
    # ceil(len/256); derive from a scan over block-boundary flags —
    # a pair opens a new block iff it starts a segment or w % 256 == 0
    opens = (is_start | (w % 256 == 0)) & valid_s
    block_of = jnp.cumsum(opens.astype(jnp.int32)) - 1
    block_of = jnp.where(valid_s, block_of, B - 1)
    slot = w % 256

    block_leaf = (
        jnp.full((B,), -1, jnp.int32)
        .at[block_of]
        .max(jnp.where(valid_s, leaf_s, -1), mode="drop")
    )
    slot_ray = (
        jnp.zeros((B, 256), jnp.int32)
        .at[block_of, slot]
        .max(jnp.where(valid_s, ray_s, 0), mode="drop")
    )
    slot_valid = (
        jnp.zeros((B, 256), bool)
        .at[block_of, slot]
        .max(valid_s, mode="drop")
    )
    return block_leaf, slot_ray, slot_valid, block_of, slot, idx


def _pairs_kernel(any_hit):
    """Möller over per-leaf ray blocks. Grid steps process
    BLOCKS_PER_STEP blocks with a 2-slot leaf-slab DMA ring."""

    def kernel(
        leaf_ref,  # scalar prefetch (B,) i32
        cols_ref,  # VMEM (K, 8, 256): ox oy oz dx dy dz tmin tupper
        tris_hbm,  # ANY (C, 9, 128) (closest) / (C, ROWS, 128)
        out_ref,  # VMEM (K, 4, 256) f32: t, tri, u, v (any: hit row 0)
        tri_slab,  # VMEM scratch (2, 9, 128)
        sems,  # DMA (2,)
    ):
        step = pl.program_id(0)
        K = BLOCKS_PER_STEP

        def get_dma(slot, c):
            return pltpu.make_async_copy(
                tris_hbm.at[c, 0:9], tri_slab.at[slot], sems.at[slot]
            )

        def blk(k):
            # clamped so the (untaken) k+1==K prefetch branch never reads
            # past the scalar array on the last grid step
            last = pl.num_programs(0) * K - 1
            return leaf_ref[jnp.minimum(step * K + k, last)]

        @pl.when(blk(0) >= 0)
        def _():
            get_dma(0, blk(0)).start()

        def body(k, _):
            leaf = blk(k)
            nxt = jax.lax.cond(
                k + 1 < K, lambda: blk(k + 1), lambda: jnp.int32(-1)
            )

            @pl.when(nxt >= 0)
            def _():
                get_dma((k + 1) % 2, nxt).start()

            @pl.when(leaf >= 0)
            def _():
                get_dma(k % 2, leaf).wait()
                colsT = jnp.transpose(cols_ref[k], (1, 0))  # (256, 8)
                ox = colsT[:, 0:1]
                oy = colsT[:, 1:2]
                oz = colsT[:, 2:3]
                dx = colsT[:, 3:4]
                dy = colsT[:, 4:5]
                dz = colsT[:, 5:6]
                t_min = colsT[:, 6:7]
                t_up = colsT[:, 7:8]
                hit, t, u, v = _moller_block(
                    tri_slab[k % 2].astype(jnp.float32),
                    ox, oy, oz, dx, dy, dz, t_min, t_up,
                )
                if any_hit:
                    occ = jnp.any(hit, axis=1, keepdims=True)
                    out_ref[k] = jnp.transpose(
                        jnp.concatenate(
                            [
                                occ.astype(jnp.float32),
                                jnp.zeros((256, 3), jnp.float32),
                            ],
                            axis=1,
                        ),
                        (1, 0),
                    )
                else:
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (256, 128), 1
                    )
                    tmin_r = jnp.min(t, axis=1, keepdims=True)
                    is_best = t == tmin_r
                    j = jnp.min(
                        jnp.where(is_best, lane, 128), axis=1, keepdims=True
                    )
                    sel = is_best & (lane == j)
                    u_sel = jnp.sum(
                        jnp.where(sel, u, 0.0), axis=1, keepdims=True
                    )
                    v_sel = jnp.sum(
                        jnp.where(sel, v, 0.0), axis=1, keepdims=True
                    )
                    found = jnp.isfinite(tmin_r)
                    tri = jnp.where(
                        found, leaf * 128 + j, -1
                    ).astype(jnp.float32)
                    out_ref[k] = jnp.transpose(
                        jnp.concatenate(
                            [
                                jnp.where(found, tmin_r, _INF),
                                tri,
                                u_sel,
                                v_sel,
                            ],
                            axis=1,
                        ),
                        (1, 0),
                    )

            @pl.when(leaf < 0)
            def _():
                out_ref[k] = jnp.transpose(
                    jnp.concatenate(
                        [
                            jnp.full((256, 1), _INF, jnp.float32),
                            jnp.full((256, 1), -1.0, jnp.float32),
                            jnp.zeros((256, 2), jnp.float32),
                        ],
                        axis=1,
                    ),
                    (1, 0),
                )

            return 0

        jax.lax.fori_loop(0, K, body, 0)

    return kernel


def _run_pairs(tris_packed, block_leaf, cols, any_hit):
    B = block_leaf.shape[0]
    pad = (-B) % BLOCKS_PER_STEP
    if pad:
        block_leaf = jnp.concatenate(
            [block_leaf, jnp.full((pad,), -1, jnp.int32)]
        )
        cols = jnp.concatenate(
            [cols, jnp.zeros((pad,) + cols.shape[1:], cols.dtype)]
        )
    Bp = block_leaf.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // BLOCKS_PER_STEP,),
        in_specs=[
            pl.BlockSpec(
                (BLOCKS_PER_STEP, 8, 256),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (BLOCKS_PER_STEP, 4, 256),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 9, 128), tris_packed.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        _pairs_kernel(any_hit),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 4, 256), jnp.float32),
        ],
    )(block_leaf, cols, tris_packed)
    return out[:B]


def _pack_cols(ray_o, ray_d, t_min, t_max, slot_ray, slot_valid):
    """Gather per-slot ray columns -> (B, 8, 256)."""
    R = ray_o.shape[0]
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    feat = jnp.concatenate(
        [
            ray_o,
            ray_d,
            t_min_b[:, None],
            t_max_b[:, None],
        ],
        axis=1,
    )  # (R, 8)
    g = feat[slot_ray]  # (B, 256, 8)
    # dead slots: zero direction + t_upper 0 can never hit
    g = jnp.where(slot_valid[..., None], g, 0.0)
    return jnp.transpose(g, (0, 2, 1))


@jax.jit
def trace_closest_leafmajor(
    tris_packed,  # (C, >=9, 128) f32 (only rows 0:9 are read)
    wc_min,
    wc_max,
    ray_o,
    ray_d,
    t_min,
    t_max,
):
    """Closest hit via leaf-major pair blocks; same contract as
    trace_bvh.trace_closest_bvh: dict(t, tri, u, v), t=inf on miss.
    Also returns pair overflow under key "_overflow" (diagnostic)."""
    R = ray_o.shape[0]
    C = wc_min.shape[0]
    pair_ray, pair_leaf, pair_valid, overflow = _enumerate(
        wc_min, wc_max, ray_o, ray_d, t_min, t_max
    )
    hit = _closest_from_pairs(
        tris_packed, pair_ray, pair_leaf, pair_valid, C, R,
        ray_o, ray_d, t_min, t_max,
    )
    hit["_overflow"] = overflow
    return hit


def _closest_from_pairs(
    tris_packed, pair_ray, pair_leaf, pair_valid, C, R,
    ray_o, ray_d, t_min, t_max,
):
    """Leaf-major closest hit from a leaf-grouped pair list: pair blocks
    -> dense Möller -> scatter-min combine. Returns dict(t, tri, u, v)."""
    block_leaf, slot_ray, slot_valid, _, _, _ = build_blocks(
        pair_ray, pair_leaf, pair_valid, C
    )
    cols = _pack_cols(ray_o, ray_d, t_min, t_max, slot_ray, slot_valid)
    out = _run_pairs(tris_packed, block_leaf, cols, any_hit=False)

    t_blk = jnp.where(slot_valid, out[:, 0, :], _INF).reshape(-1)
    ray_flat = jnp.where(slot_valid, slot_ray, R).reshape(-1)

    best_t = (
        jnp.full((R + 1,), _INF, jnp.float32)
        .at[ray_flat]
        .min(t_blk, mode="drop")[:R]
    )
    # payload: among slots whose t equals the ray's best, pick min tri id
    # (deterministic ties)
    tri_blk = out[:, 1, :].reshape(-1).astype(jnp.int32)
    is_best = t_blk <= best_t[jnp.minimum(ray_flat, R - 1)]
    is_best = is_best & (ray_flat < R) & jnp.isfinite(t_blk) & (t_blk < _INF)
    big = jnp.int32(2**30)
    best_tri = (
        jnp.full((R + 1,), big, jnp.int32)
        .at[jnp.where(is_best, ray_flat, R)]
        .min(jnp.where(is_best, tri_blk, big), mode="drop")[:R]
    )
    tri_match = is_best & (tri_blk == best_tri[jnp.minimum(ray_flat, R - 1)])
    u_blk = out[:, 2, :].reshape(-1)
    v_blk = out[:, 3, :].reshape(-1)
    best_u = (
        jnp.zeros((R + 1,), jnp.float32)
        .at[jnp.where(tri_match, ray_flat, R)]
        .max(jnp.where(tri_match, u_blk, -1.0), mode="drop")[:R]
    )
    best_v = (
        jnp.zeros((R + 1,), jnp.float32)
        .at[jnp.where(tri_match, ray_flat, R)]
        .max(jnp.where(tri_match, v_blk, -1.0), mode="drop")[:R]
    )
    miss = best_t >= _INF
    return {
        "t": jnp.where(miss, jnp.inf, best_t),
        "tri": jnp.where(miss, -1, best_tri),
        "u": jnp.maximum(best_u, 0.0),
        "v": jnp.maximum(best_v, 0.0),
    }


@jax.jit
def trace_any_leafmajor(
    tris_packed,
    wc_min,
    wc_max,
    ray_o,
    ray_d,
    t_min,
    t_max,
):
    """Any-hit (shadow) via leaf-major pair blocks; returns (R,) bool
    occluded (+ overflow diagnostic as second value)."""
    R = ray_o.shape[0]
    C = wc_min.shape[0]
    pair_ray, pair_leaf, pair_valid, overflow = _enumerate(
        wc_min, wc_max, ray_o, ray_d, t_min, t_max
    )
    occ = _any_from_pairs(
        tris_packed, pair_ray, pair_leaf, pair_valid, C, R,
        ray_o, ray_d, t_min, t_max,
    )
    return occ, overflow


def _any_from_pairs(
    tris_packed, pair_ray, pair_leaf, pair_valid, C, R,
    ray_o, ray_d, t_min, t_max,
):
    """Leaf-major any-hit from a leaf-grouped pair list -> (R,) bool."""
    block_leaf, slot_ray, slot_valid, _, _, _ = build_blocks(
        pair_ray, pair_leaf, pair_valid, C
    )
    cols = _pack_cols(ray_o, ray_d, t_min, t_max, slot_ray, slot_valid)
    out = _run_pairs(tris_packed, block_leaf, cols, any_hit=True)
    hit_blk = (out[:, 0, :] > 0.0) & slot_valid
    ray_flat = jnp.where(slot_valid, slot_ray, R).reshape(-1)
    occ = (
        jnp.zeros((R + 1,), bool)
        .at[ray_flat]
        .max(hit_blk.reshape(-1), mode="drop")[:R]
    )
    return occ


def _heavy_perm(heavy):
    """Heavy-first stable order + inverse (heavy rays form contiguous
    leading packets for the packet kernel; stable keeps the caller's
    spatial coherence within each group)."""
    R = heavy.shape[0]
    perm = jnp.argsort(~heavy, stable=True)
    inv = (
        jnp.zeros_like(perm)
        .at[perm]
        .set(jnp.arange(R, dtype=perm.dtype))
    )
    return perm, inv


def trace_closest_hybrid(
    tris_packed, bvh_bounds, bvh_meta, wc_min, wc_max,
    ray_o, ray_d, t_min, t_max,
):
    """Closest hit, hybrid leaf-major/packet (the round-4 production
    incoherent-ray tracer): rays whose candidate-cluster count fits
    PAIR_CAP_PER_RAY get exact leaf-major pair blocks (dense Möller over
    exactly the (ray, leaf) pairs — ~7x less intersection math than
    packet union visits); rays with MORE candidates ("heavy", the ones
    where the packet kernel's front-to-back pruning shines) are sorted
    heavy-first and traced by the packet BVH kernel with everyone else
    disabled via t_max = 0. Exact always; the only global fallback left
    is per-tile candidate overflow (> VIS_CAP, see *_safe).

    Returns (hit dict(t, tri, u, v), tile_overflow).
    """
    from .trace_bvh import trace_closest_bvh

    R = ray_o.shape[0]
    C = wc_min.shape[0]
    ray_leaf, heavy_p, tile_ovf = candidate_lists(
        wc_min, wc_max, ray_o, ray_d, t_min, t_max
    )
    heavy = heavy_p[:R]
    ray_leaf = jnp.where(heavy_p[:, None], C, ray_leaf)  # light only
    pair_ray, pair_leaf, pair_valid = pairs_from_lists(ray_leaf, C)
    h_lm = _closest_from_pairs(
        tris_packed, pair_ray, pair_leaf, pair_valid, C, R,
        ray_o, ray_d, t_min, t_max,
    )

    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    tmax_h = jnp.where(heavy, t_max_b, 0.0)
    perm, inv = _heavy_perm(heavy)
    h_pk = trace_closest_bvh(
        tris_packed, bvh_bounds, bvh_meta, ray_o, ray_d, t_min, tmax_h,
        perm=perm,
    )
    hit = {
        k: jnp.where(heavy, h_pk[k][inv], h_lm[k])
        for k in ("t", "tri", "u", "v")
    }
    # packet kernel reports miss as t = t_max; normalize to inf like the
    # leaf-major contract
    hit["t"] = jnp.where(hit["tri"] < 0, jnp.inf, hit["t"])
    return hit, tile_ovf


def trace_any_hybrid(
    tris_packed, bvh_bounds, bvh_meta, wc_min, wc_max,
    ray_o, ray_d, t_min, t_max,
):
    """Any-hit, hybrid leaf-major/packet (see trace_closest_hybrid).
    Returns (occluded (R,) bool, tile_overflow)."""
    from .trace_bvh import trace_any_bvh

    R = ray_o.shape[0]
    C = wc_min.shape[0]
    ray_leaf, heavy_p, tile_ovf = candidate_lists(
        wc_min, wc_max, ray_o, ray_d, t_min, t_max
    )
    heavy = heavy_p[:R]
    ray_leaf = jnp.where(heavy_p[:, None], C, ray_leaf)
    pair_ray, pair_leaf, pair_valid = pairs_from_lists(ray_leaf, C)
    occ_lm = _any_from_pairs(
        tris_packed, pair_ray, pair_leaf, pair_valid, C, R,
        ray_o, ray_d, t_min, t_max,
    )
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    tmax_h = jnp.where(heavy, t_max_b, 0.0)
    perm, inv = _heavy_perm(heavy)
    occ_pk = trace_any_bvh(
        tris_packed, bvh_bounds, bvh_meta, ray_o, ray_d, t_min, tmax_h,
        perm=perm,
    )
    return jnp.where(heavy, occ_pk[inv], occ_lm), tile_ovf


def trace_closest_leafmajor_safe(
    tris_packed, bvh_bounds, bvh_meta, wc_min, wc_max,
    ray_o, ray_d, t_min, t_max,
):
    """Exact closest hit via the HYBRID tracer: per-ray candidate
    overflow AND per-tile VIS_CAP overflow both route the affected rays
    to the packet BVH kernel (candidate_lists marks them heavy), so no
    global fallback is needed; the reference's traversal is exact always
    (main.rgen:196-226), and so is this. Kept under the _safe name for
    the make_bounce_tracer contract."""
    h, _tile_ovf = trace_closest_hybrid(
        tris_packed, bvh_bounds, bvh_meta, wc_min, wc_max,
        ray_o, ray_d, t_min, t_max,
    )
    return {k: h[k] for k in ("t", "tri", "u", "v")}


def trace_any_leafmajor_safe(
    tris_packed, bvh_bounds, bvh_meta, wc_min, wc_max,
    ray_o, ray_d, t_min, t_max,
):
    """Overflow-exact any-hit; see trace_closest_leafmajor_safe."""
    occ, _tile_ovf = trace_any_hybrid(
        tris_packed, bvh_bounds, bvh_meta, wc_min, wc_max,
        ray_o, ray_d, t_min, t_max,
    )
    return occ


def trace_closest_leafmajor_full_safe(
    tris_packed_full, bvh_bounds, bvh_meta, wc_min, wc_max,
    ray_o, ray_d, t_min, t_max,
):
    """Overflow-exact closest hit + attribute interpolation (the
    trace_closest_bvh_full contract)."""
    h = trace_closest_leafmajor_safe(
        tris_packed_full, bvh_bounds, bvh_meta, wc_min, wc_max,
        ray_o, ray_d, t_min, t_max,
    )
    return attrs_from_hit(tris_packed_full, h)


def attrs_from_hit(tris_packed_full, hit):
    """Interpolate the fused-kernel attribute set for leaf-major hits:
    one (R, 29) row gather from the 40-row packed arena + the same
    barycentric blend the packet kernel fuses in
    (trace_bvh._closest_body interp; rows 9:38 = n0n1n2 | t0t1t2 |
    uv0uv1uv2 | material | lod). Returns the trace_closest_bvh_full hit
    dict."""
    C = tris_packed_full.shape[0]
    rows = tris_packed_full.shape[1]
    tri = jnp.maximum(hit["tri"], 0)
    c = tri // 128
    lane = tri % 128
    flat = tris_packed_full.reshape(C * rows * 128)
    base = (c * rows) * 128 + lane  # row 0 of my cluster, my lane
    idx = base[:, None] + jnp.arange(9, 38, dtype=tri.dtype)[None, :] * 128
    a = flat[idx].astype(jnp.float32)  # (R, 29): rows 9..37
    u = hit["u"][:, None]
    v = hit["v"][:, None]
    w_b = 1.0 - u - v
    normal = w_b * a[:, 0:3] + u * a[:, 3:6] + v * a[:, 6:9]
    tangent = w_b * a[:, 9:13] + u * a[:, 13:17] + v * a[:, 17:21]
    uv = w_b * a[:, 21:23] + u * a[:, 23:25] + v * a[:, 25:27]
    miss = hit["tri"] < 0
    return {
        "t": hit["t"],
        "tri": hit["tri"],
        "normal": jnp.where(miss[:, None], 0.0, normal),
        "tangent": jnp.where(miss[:, None], 0.0, tangent),
        "uv": jnp.where(miss[:, None], 0.0, uv),
        "material": jnp.where(miss, 0, a[:, 27].astype(jnp.int32)),
        "tri_lod": jnp.where(miss, 0.0, a[:, 28]),
    }


def trace_closest_leafmajor_full(
    tris_packed_full, wc_min, wc_max, ray_o, ray_d, t_min, t_max
):
    """Leaf-major closest hit + attribute interpolation: same contract
    as trace_bvh.trace_closest_bvh_full (minus the packed/perm options —
    leaf-major needs no ray sorting)."""
    h = trace_closest_leafmajor(
        tris_packed_full, wc_min, wc_max, ray_o, ray_d, t_min, t_max
    )
    return attrs_from_hit(tris_packed_full, h)
