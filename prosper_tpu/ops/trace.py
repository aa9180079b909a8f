"""Closest-hit / any-hit ray tracing over the flattened cluster scene.

TPU-first traversal design (SURVEY.md §7 hard part #1): instead of a
per-ray divergent BVH walk (pointer chasing is hostile to the VPU), rays
are processed in coherent tiles; a conservative packet-vs-cluster-AABB cull
produces per-tile cluster work lists, then each tile intersects whole
128-triangle cluster slabs as dense (LANES x 128) vector ops — gathers
become regular tile loads and the FLOPs land on the VPU at full width.

This module is the pure-XLA implementation (runs on CPU for tests and on
TPU as the fallback path); ops/trace_pallas.py holds the hand-tiled kernel
with the same semantics.

Replaces: VK ray tracing pipeline + BLAS/TLAS traversal
(/root/reference/src/render/RtReference.cpp:301-527, TLAS rebuild
World.cpp:749-802).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import config
from .intersect import moller_trumbore, packet_aabb_overlap

TILE = 256  # rays per packet: 2 VPU sublane-rows of 128 lanes
CLUSTER_PAD = 128  # triangles per cluster slab (scene/meshlets.py)


def make_tracer(tris: dict, wc_min, wc_max, bvh=None, packed9=None):
    """Returns (closest_fn, any_fn) with signature (o, d, t_min, t_max).

    On TPU backends the Pallas kernels are used: the in-kernel BVH
    descent (ops/trace_bvh) when `bvh=(bounds, meta)` node arrays are
    provided (the per-frame TLAS analog, scene/world.frame_arrays), else
    the flat cull-list kernels (ops/trace_pallas). On CPU the XLA
    reference path runs (Pallas interpret mode is far too slow for full
    frames).

    packed9: optional precomputed (C, 9, 128) Möller slabs
    (prepare_geometry) so per-frame jits skip the device re-pack.
    """
    import jax

    from functools import partial as _partial

    if jax.default_backend() != "cpu":
        from . import trace_pallas

        packed = (
            packed9 if packed9 is not None else trace_pallas.pack_tris(tris)
        )
        if bvh is not None:
            from . import trace_bvh

            bounds, meta = bvh
            # any-hit descent policy (ONE decision point, set through
            # config.policy / the --any-tracer CLI flag): measured
            # numbers next to the knob in config.KernelPolicy.
            any_impl = (
                trace_bvh.trace_any_bvh_dense
                if config.policy.any_tracer == "dense"
                else trace_bvh.trace_any_bvh
            )
            return (
                _partial(trace_bvh.trace_closest_bvh, packed, bounds, meta),
                _partial(any_impl, packed, bounds, meta),
            )
        return (
            _partial(trace_pallas.trace_closest_pallas, packed, wc_min, wc_max),
            _partial(trace_pallas.trace_any_pallas, packed, wc_min, wc_max),
        )
    return (
        _partial(trace_closest, tris, wc_min, wc_max),
        _partial(trace_any, tris, wc_min, wc_max),
    )


def prepare_geometry(static_scene: dict, transforms, normal_transforms):
    """Device-side world-space geometry prep, hoisted OUT of the frame jits.

    Re-transforming and re-packing every triangle inside each frame's jit
    is a full BLAS refit per frame — the reference builds BLAS device data
    once and only rebuilds the instance-level TLAS per frame
    (/root/reference/src/scene/World.cpp:749-802). Measured on v5e
    (FlightHelmet, round 4): the in-jit pack costs ~16 ms device per
    frame across every mode. Callers stash the result at frame["geom"]
    (see GeometryCache for the recompute-on-transform-change pacing);
    frame_geometry() falls back to inline computation when absent.

    Returns: {"tris": world-space tri dict} plus, on TPU backends,
    {"packed9": (C, 9, 128) Möller slabs, "packed_full": (C, 40, 128)
    attribute slabs}.
    """
    frame_like = {
        "transforms": transforms,
        "normal_transforms": normal_transforms,
    }
    out = {"tris": world_triangles(static_scene, frame_like)}
    if jax.default_backend() != "cpu":
        from . import trace_pallas
        from .trace_pallas_full import pack_tris_full

        out["packed9"] = trace_pallas.pack_tris(out["tris"])
        out["packed_full"] = pack_tris_full(static_scene, frame_like)
        from .trace_bvh import attr_rows_from_packed

        out["attr_rows"] = attr_rows_from_packed(out["packed_full"])
    return out


def frame_geometry(static_scene: dict, frame: dict) -> dict:
    """frame["geom"] when the caller prepared it, else the inline
    equivalent (tests/scripts that build raw frame dicts keep working)."""
    geom = frame.get("geom")
    if geom is not None:
        return geom
    return prepare_geometry(
        static_scene, frame["transforms"], frame["normal_transforms"]
    )


class GeometryCache:
    """Host-side pacing for prepare_geometry: recompute only when the
    instance transforms change (animation), reuse the device arrays
    otherwise — the TPU analog of static BLAS + per-frame TLAS.
    """

    def __init__(self):
        self._jit = jax.jit(prepare_geometry)
        self._key = None
        self._val = None

    def get(self, static_dev: dict, transforms, normal_transforms) -> dict:
        import numpy as np

        key = (
            np.asarray(transforms).tobytes(),
            np.asarray(normal_transforms).tobytes(),
        )
        if self._val is None or key != self._key:
            self._val = self._jit(
                static_dev,
                jnp.asarray(transforms),
                jnp.asarray(normal_transforms),
            )
            self._key = key
        return self._val


BOUNCE_TILE = 128  # rays/packet for INCOHERENT bounce-closest traces.
# Packet union-visit waste scales with packet size (FlightHelmet bounce
# set, scripts/visit_union_analysis.py: 41 leaf visits per 256-ray
# packet vs 26.8 per 128 vs a 2.6/ray ideal). Measured on v5e: bounce
# closest 37.1 -> 30.2 ms at tile=128; SHADOW rays stay at 256 — they
# converge on one light so packets are coherent and halving them only
# doubles descent work (10.6 -> 12.6 ms). Primary rays keep 256.

LEAFMAJOR_MAX_CLUSTERS = 4096  # dense pair enumeration is O(R x C)


def bounce_policy(n_clusters: int, bvh, prefer: str | None = None) -> bool:
    """True when incoherent rays should use the leaf-major pair tracer
    (the decision behind make_bounce_tracer, callable without slabs).
    prefer=None reads config.policy.bounce_tracer (the --bounce-tracer
    CLI flag; packet is the measured default)."""
    import jax

    if prefer is None:
        prefer = config.policy.bounce_tracer
    return (
        prefer == "leafmajor"
        and jax.default_backend() != "cpu"
        and bvh is not None
        and n_clusters <= LEAFMAJOR_MAX_CLUSTERS
    )


def make_bounce_tracer(packed, wc_min, wc_max, bvh, prefer=None):
    """THE policy for incoherent (bounce/shadow) ray tracing — the one
    decision point for leaf-major pair blocks vs packet BVH traversal
    (previously three hardcoded gates across render/pt.py and
    render/restir.py).

    Returns None when callers should use their packet path (CPU backend,
    no BVH node arrays, cluster count beyond the dense enumerator's
    O(R x C) range, or prefer="packet"). Otherwise returns a dict:
      any:          (o, d, t_min, t_max) -> occluded (R,) bool
      closest_full: same signature -> full attr hit dict, or None when
                    `packed` has geometry-only rows (< 38)
    Both are overflow-EXACT: on pair-capacity overflow the wavefront
    re-traces through the packet BVH kernel inside lax.cond
    (trace_leafmajor.*_safe), matching the reference's always-exact
    traversal (res/shader/rt/reference/main.rgen:196-226).
    """
    if not bounce_policy(wc_min.shape[0], bvh, prefer):
        return None
    from functools import partial as _partial

    from . import trace_leafmajor as lm

    bounds, meta = bvh
    closest_full = None
    if packed.shape[1] >= 38:
        closest_full = _partial(
            lm.trace_closest_leafmajor_full_safe,
            packed, bounds, meta, wc_min, wc_max,
        )
    return {
        "any": _partial(
            lm.trace_any_leafmajor_safe, packed, bounds, meta, wc_min, wc_max
        ),
        "closest_full": closest_full,
    }


def frame_bvh(frame: dict):
    """(bounds, meta) from a frame dict, or None when absent."""
    if "bvh_bounds" in frame and "bvh_meta" in frame:
        return frame["bvh_bounds"], frame["bvh_meta"]
    return None


def block_pixel_order(width: int, height: int, block: int = 16):
    """Pixel traversal order that groups 16x16 screen blocks into ray
    tiles (256 rays): compact packet bounds instead of row strips.

    Returns (px, py, inverse) — px/py: (R,) uint32 in block order;
    `inverse` scatters block-order results back to row-major:
    row_major = blocked[inverse].
    """
    import numpy as np

    bx = -(-width // block)
    by = -(-height // block)
    ys, xs = np.meshgrid(np.arange(by * block), np.arange(bx * block), indexing="ij")
    # block-major order
    order = np.argsort(
        ((ys // block) * bx + (xs // block)) * (block * block)
        + (ys % block) * block
        + (xs % block),
        axis=None,
        kind="stable",
    )
    px = (xs.reshape(-1)[order]).astype(np.uint32)
    py = (ys.reshape(-1)[order]).astype(np.uint32)
    keep = (px < width) & (py < height)
    px, py = px[keep], py[keep]
    flat = py.astype(np.int64) * width + px.astype(np.int64)
    inverse = np.argsort(flat, kind="stable")
    return px, py, inverse


def block_order_padded(width: int, height: int, block: int = 16):
    """Like block_pixel_order but over the FULL padded block grid (height
    rounded up to a 2*block multiple so 16 px blocks tile the 32 px
    froxel tiles evenly): the resulting permutation block-order <->
    row-major is REGULAR, so the unsort is a reshape/transpose instead of
    a 2M-row gather (measured 24 ms/frame at 1080p x 16 channels).

    Block traversal is TILE-MAJOR (round 5): the four 16 px blocks of
    each 32 px froxel tile are CONSECUTIVE — order (tile_y, tile_x,
    sub_by, sub_bx, iy, ix) — so a froxel tile is exactly 1024
    consecutive rows and shade_tiles' tile assembly is a per-channel
    reshape instead of a 7-D shuffle (the (34,2,60,2,16,16,C)
    broadcast/concat/transpose chain was ~10 ms of the 1080p deferred
    xplane). Every consecutive 256-row group is still one 16 px block,
    so ray tiles, tile_apply compaction and the primary tile mask keep
    their bounds.

    Returns (px, py, padded_height); rays with py >= height are padding
    (callers mark them invalid). width must be a multiple of `block`.
    """
    import numpy as np

    assert width % block == 0, width
    hp = -(-height // (2 * block)) * (2 * block)
    by, bx = hp // block, width // block
    assert by % 2 == 0 and bx % 2 == 0, (width, height)
    ty, tx = by // 2, bx // 2
    yy, xx = np.meshgrid(
        np.arange(block, dtype=np.uint32),
        np.arange(block, dtype=np.uint32),
        indexing="ij",
    )
    # (ty, tx, sby, sbx, iy, ix)
    px = (
        np.arange(tx, dtype=np.uint32)[None, :, None, None, None, None]
        * (2 * block)
        + np.arange(2, dtype=np.uint32)[None, None, None, :, None, None]
        * block
        + xx[None, None, None, None]
    )
    py = (
        np.arange(ty, dtype=np.uint32)[:, None, None, None, None, None]
        * (2 * block)
        + np.arange(2, dtype=np.uint32)[None, None, :, None, None, None]
        * block
        + yy[None, None, None, None]
    )
    shape = (ty, tx, 2, 2, block, block)
    px = np.broadcast_to(px, shape).reshape(-1)
    py = np.broadcast_to(py, shape).reshape(-1)
    return px.copy(), py.copy(), hp


def blocks_to_rows(a, width: int, height: int, block: int = 16):
    """(R_pad, ...) in block_order_padded order -> (height*width, ...)
    row-major, via a regular reshape/transpose (no gather)."""
    hp = a.shape[0] // width
    ty, tx = hp // (2 * block), width // (2 * block)
    rest = a.shape[1:]
    img = a.reshape((ty, tx, 2, 2, block, block) + rest)
    # (ty, tx, sby, sbx, iy, ix) -> (ty, sby, iy, tx, sbx, ix)
    img = jnp.transpose(
        img, (0, 2, 4, 1, 3, 5) + tuple(range(6, 6 + len(rest)))
    ).reshape((hp, width) + rest)
    return img[:height].reshape((height * width,) + rest)


def rows_to_blocks(a, width: int, height: int, block: int = 16):
    """(height*width, ...) row-major -> (R_pad, ...) block order (pads
    extra rows with zeros)."""
    hp = -(-height // (2 * block)) * (2 * block)
    rest = a.shape[1:]
    img = a.reshape((height, width) + rest)
    if hp != height:
        img = jnp.concatenate(
            [img, jnp.zeros((hp - height, width) + rest, a.dtype)], axis=0
        )
    ty, tx = hp // (2 * block), width // (2 * block)
    img = img.reshape((ty, 2, block, tx, 2, block) + rest)
    # (ty, sby, iy, tx, sbx, ix) -> (ty, tx, sby, sbx, iy, ix)
    img = jnp.transpose(
        img, (0, 3, 1, 4, 2, 5) + tuple(range(6, 6 + len(rest)))
    )
    return img.reshape((hp * width,) + rest)


def block_inverse16(width: int, height: int, block: int = 16):
    """Segment-level inverse of block_pixel_order: row-major 16-pixel
    segment s is block-order segment inv16[s]. Valid because every 16
    consecutive block-order lanes are one within-block x-run = 16
    consecutive row-major pixels (requires width % 16 == 0). Permuting
    (R//16, 16, ...) rows costs 1/16th of the per-pixel gather.
    """
    assert width % 16 == 0, width
    _, _, inverse = block_pixel_order(width, height, block)
    return (inverse[::16] // 16).astype(inverse.dtype)


def permute16(a, inv16):
    """Apply a segment-level permutation (block_inverse16) to (R, ...).
    Moving (R/16, 16, k) segment rows costs 1/16th of a per-pixel
    gather (flat (R/16, 16*k) rows measured the same)."""
    R = a.shape[0]
    seg = a.reshape((R // 16, 16) + a.shape[1:])
    return seg[inv16].reshape(a.shape)


def _pad_rays(ray_o, ray_d):
    """Pad ray count to a TILE multiple with miss-guaranteed dummy rays.

    Dummy rays keep the origin of ray 0 (so packet origin bounds stay
    tight) with a zero direction, which can never pass the slab/Möller
    tests. Returns (o, d, original_count)."""
    R = ray_o.shape[0]
    pad = (-R) % TILE
    if pad == 0:
        return ray_o, ray_d, R
    o_pad = jnp.broadcast_to(ray_o[:1], (pad, 3))
    d_pad = jnp.zeros((pad, 3), ray_d.dtype)
    return (
        jnp.concatenate([ray_o, o_pad], axis=0),
        jnp.concatenate([ray_d, d_pad], axis=0),
        R,
    )


def world_triangles(static_scene: dict, frame: dict) -> dict:
    """Transform object-space cluster tris to world space (device, fused).

    The per-frame analog of the TLAS rebuild: one batched affine transform
    over the whole arena, gathering each triangle's instance matrix.
    """
    m = frame["transforms"]  # (I, 3, 4)
    inst = static_scene["wt_instance"]  # (S,)
    mi = m[inst]  # (S, 3, 4) gather

    def xf(p):
        return jnp.einsum("sij,sj->si", mi[:, :, :3], p) + mi[:, :, 3]

    p0 = xf(static_scene["wt_p0"])
    p1 = xf(static_scene["wt_p1"])
    p2 = xf(static_scene["wt_p2"])
    return {"v0": p0, "e1": p1 - p0, "e2": p2 - p0}


@partial(jax.jit, static_argnames=("max_clusters",))
def trace_closest(
    tris: dict,
    wc_min: jnp.ndarray,
    wc_max: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    max_clusters: int | None = None,
):
    """Closest hit for R rays (R multiple of TILE).

    Returns dict: t (R,), tri (R,) int32 slot index (-1 = miss),
    u, v (R,) barycentrics.
    """
    n_clusters = wc_min.shape[0]
    max_clusters = max_clusters or n_clusters
    t_max_full = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],)
    )
    ray_o, ray_d, R_out = _pad_rays(ray_o, ray_d)
    R = ray_o.shape[0]
    n_tiles = R // TILE
    o_t = ray_o.reshape(n_tiles, TILE, 3)
    d_t = ray_d.reshape(n_tiles, TILE, 3)
    t_max_t = jnp.concatenate(
        [t_max_full, jnp.zeros((R - R_out,), jnp.float32)]
    ).reshape(n_tiles, TILE)
    t_min = jnp.asarray(t_min, jnp.float32)

    # ---- phase 1: conservative packet cull -> per-tile cluster lists ----
    o_lo, o_hi = o_t.min(axis=1), o_t.max(axis=1)
    d_lo, d_hi = d_t.min(axis=1), d_t.max(axis=1)
    overlap = packet_aabb_overlap(
        o_lo[:, None, :],
        o_hi[:, None, :],
        d_lo[:, None, :],
        d_hi[:, None, :],
        wc_min[None, :, :],
        wc_max[None, :, :],
        t_max_t.max(axis=1)[:, None],
    )  # (T, C)
    counts = overlap.sum(axis=1).astype(jnp.int32)  # (T,)
    # stable-compact overlapping cluster ids to the front
    order = jnp.argsort(~overlap, axis=1, stable=True)  # (T, C)
    lists = order[:, :max_clusters].astype(jnp.int32)
    counts = jnp.minimum(counts, max_clusters)

    v0, e1, e2 = tris["v0"], tris["e1"], tris["e2"]

    # ---- phase 2: per-tile dense slab intersection ----
    def tile_trace(o, d, tmax0, clist, count):
        def cond(state):
            k = state[0]
            return k < count

        def body(state):
            k, best_t, best_tri, best_u, best_v = state
            c = clist[k]
            base = c * CLUSTER_PAD
            tv0 = jax.lax.dynamic_slice(v0, (base, 0), (CLUSTER_PAD, 3))
            te1 = jax.lax.dynamic_slice(e1, (base, 0), (CLUSTER_PAD, 3))
            te2 = jax.lax.dynamic_slice(e2, (base, 0), (CLUSTER_PAD, 3))
            hit, t, u, v = moller_trumbore(
                o[:, None, :],
                d[:, None, :],
                tv0[None, :, :],
                te1[None, :, :],
                te2[None, :, :],
                t_min,
                best_t[:, None],
            )  # (TILE, 128)
            t = jnp.where(hit, t, jnp.inf)
            j = jnp.argmin(t, axis=1)  # (TILE,)
            tj = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
            better = tj < best_t
            sel = lambda new, old: jnp.where(better, new, old)
            best_tri = sel(base + j.astype(jnp.int32), best_tri)
            best_u = sel(jnp.take_along_axis(u, j[:, None], 1)[:, 0], best_u)
            best_v = sel(jnp.take_along_axis(v, j[:, None], 1)[:, 0], best_v)
            best_t = sel(tj, best_t)
            return (k + 1, best_t, best_tri, best_u, best_v)

        init = (
            jnp.int32(0),
            tmax0,
            jnp.full((TILE,), -1, jnp.int32),
            jnp.zeros((TILE,), jnp.float32),
            jnp.zeros((TILE,), jnp.float32),
        )
        _, bt, btri, bu, bv = jax.lax.while_loop(cond, body, init)
        return bt, btri, bu, bv

    bt, btri, bu, bv = jax.vmap(tile_trace)(o_t, d_t, t_max_t, lists, counts)
    return {
        "t": bt.reshape(R)[:R_out],
        "tri": btri.reshape(R)[:R_out],
        "u": bu.reshape(R)[:R_out],
        "v": bv.reshape(R)[:R_out],
    }


@partial(jax.jit, static_argnames=("max_clusters",))
def trace_any(
    tris: dict,
    wc_min: jnp.ndarray,
    wc_max: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    max_clusters: int | None = None,
):
    """Any-hit (shadow) rays: returns occluded mask (R,) bool.

    Same phases as trace_closest but terminates a tile as soon as all its
    rays are occluded (TerminateOnFirstHit analog, main.rgen shadow rays).
    """
    n_clusters = wc_min.shape[0]
    max_clusters = max_clusters or n_clusters
    t_max_full = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],)
    )
    ray_o, ray_d, R_out = _pad_rays(ray_o, ray_d)
    R = ray_o.shape[0]
    n_tiles = R // TILE
    o_t = ray_o.reshape(n_tiles, TILE, 3)
    d_t = ray_d.reshape(n_tiles, TILE, 3)
    t_max_t = jnp.concatenate(
        [t_max_full, jnp.zeros((R - R_out,), jnp.float32)]
    ).reshape(n_tiles, TILE)
    t_min = jnp.asarray(t_min, jnp.float32)

    o_lo, o_hi = o_t.min(axis=1), o_t.max(axis=1)
    d_lo, d_hi = d_t.min(axis=1), d_t.max(axis=1)
    overlap = packet_aabb_overlap(
        o_lo[:, None, :],
        o_hi[:, None, :],
        d_lo[:, None, :],
        d_hi[:, None, :],
        wc_min[None, :, :],
        wc_max[None, :, :],
        t_max_t.max(axis=1)[:, None],
    )
    counts = jnp.minimum(overlap.sum(axis=1).astype(jnp.int32), max_clusters)
    order = jnp.argsort(~overlap, axis=1, stable=True)
    lists = order[:, :max_clusters].astype(jnp.int32)

    v0, e1, e2 = tris["v0"], tris["e1"], tris["e2"]

    def tile_trace(o, d, tmax0, clist, count):
        def cond(state):
            k, occ = state
            return (k < count) & ~jnp.all(occ)

        def body(state):
            k, occ = state
            c = clist[k]
            base = c * CLUSTER_PAD
            tv0 = jax.lax.dynamic_slice(v0, (base, 0), (CLUSTER_PAD, 3))
            te1 = jax.lax.dynamic_slice(e1, (base, 0), (CLUSTER_PAD, 3))
            te2 = jax.lax.dynamic_slice(e2, (base, 0), (CLUSTER_PAD, 3))
            hit, _, _, _ = moller_trumbore(
                o[:, None, :],
                d[:, None, :],
                tv0[None, :, :],
                te1[None, :, :],
                te2[None, :, :],
                t_min,
                tmax0[:, None],
            )
            return (k + 1, occ | jnp.any(hit, axis=1))

        _, occ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((TILE,), bool))
        )
        return occ

    occ = jax.vmap(tile_trace)(o_t, d_t, t_max_t, lists, counts)
    return occ.reshape(R)[:R_out]
