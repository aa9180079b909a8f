"""Pallas TPU BVH-traversal ray kernels (round-2 rewrite of the flat
per-tile cluster-list kernels in ops/trace_pallas*.py).

Replaces the reference's hardware BLAS/TLAS traversal
(/root/reference/src/render/RtReference.cpp:301-527) with an in-kernel
packet descent over the per-frame cluster BVH built host-side
(accel/bvh.py). Differences vs the round-1 kernels:

- No XLA pre-pass: the O(tiles x clusters) conservative packet cull and
  its argsort compaction are gone. Each ray tile walks the BVH2 inside
  the kernel over SMEM node scalars (scalar-prefetch arrays), visiting
  only the nodes its own rays overlap.
- Per-ray termination: node tests compare each ray's PERSONAL best hit
  distance against the node entry, so a handful of miss rays no longer
  pin a packet-wide worst-t at infinity (the round-1 early-exit killer).
- Ordered descent: children are intersected when their parent pops and
  pushed far-first, so leaves arrive front-to-back and shadow rays
  terminate near-first.
- Leaf pipelining: while a leaf's 128-triangle slab is in flight
  (HBM->VMEM DMA), the kernel descends to the next leaf; Moller-Trumbore
  on the previous slab then overlaps the next DMA.
- TILES_PER_STEP ray tiles are processed per grid step: the per-step
  pipeline cost (~6 us of input-buffer DMA/sync) dominated sparse frames
  when every 256-ray tile was its own step.

Layout trick: per-node ray tests run on rays laid out as (2, 128)
rows (sublane x lane), where a (TILE, 1) column op would waste 128x the
VPU lanes. Ray row data is precomputed host-side (one transpose); the
per-ray best-t is maintained in both layouts (column for the Moller
t-upper, rows for node tests) with the row update coming from a free
major-dim split (TILE,128)->(2,128,128) + lane reduction.

Node arrays (from accel.bvh.pack_nodes): bounds (N, 6) f32
[min.xyz | max.xyz], meta (N, 3) i32 [left, right, leaf_cluster(-1)],
flattened to (1, N*6)/(1, N*3) for SMEM (tiles are (1, 128); 2D rows
would pad every row to 128 lanes). Leaves hold exactly one cluster
(max_leaf_size=1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import CLUSTER_PAD, TILE, _pad_rays
from .trace_pallas import _moller_block

STACK_CAP = 64  # >= bvh depth + 2; median-split depth is ~log2(C) + 1
DMA_DEPTH = 2  # leaf-slab ring slots (descent runs DMA_DEPTH-1 leaves
# ahead of Moller). Depth 4 was measured SLOWER on the bounce set (43.5
# vs 40.9 ms): DMA latency is not the wall, and deeper prefetch visits
# extra leaves through stale per-ray bounds. Kept as a ring so the depth
# is one constant.
DEBUG_VISITS = False  # plain-closest writes per-tile leaf-visit counts
# into output row 7 (perf diagnosis only; see scripts/bench_bounce.py)
DEBUG_NO_MOLLER = False  # plain-closest: skip the Moller block (t=INF);
DEBUG_NO_DMA = False  # plain-closest: skip slab DMAs (implies no Moller)
DEBUG_FAKE_ENTER = False  # node_enter returns 0.0 (no vector slab test);
# only valid on scenes where every node is entered anyway
# — in-situ cost isolation on no-hit scenes where traversal is identical
# across modes (scripts/bench_insitu.py); NEVER set in production
# The Möller VPU block is the only triangle test: the MXU Plücker block
# and the row-skip Möller variant both measured NEGATIVE on v5e and are
# archived with their numbers in experiments/README.md (round 5).

ROWS_FULL = 40  # fused-attribute slab rows (ops/trace_pallas_full.py)
ROWS_PLAIN = 9  # geometry-only slab rows (ops/trace_pallas.py)
TILES_PER_STEP = 8  # ray tiles processed per grid step
_INF = 3e38  # python float: jnp constants would be captured by kernels
_NROWS = TILE // 128  # ray rows in (NROWS, 128) layout


def _prep_bvh(ray_o, ray_d, t_max, perm=None, tile=TILE):
    """Pad rays to TILES_PER_STEP*tile multiples and build per-tile
    column + row data. `perm` applies a ray permutation with ONE fused
    (R, 7) row gather (callers sorting rays for packet coherence would
    otherwise pay 3-4 separate gathers).

    tile: rays per packet — 256 (default) for coherent sets, 128 for
    incoherent bounce/shadow wavefronts (union-visit waste scales with
    packet size: measured u(256)=41 vs u(128)=26.8 leaf visits on the
    FlightHelmet bounce set, scripts/visit_union_analysis.py).

    Returns (R, R_out, n_steps, cols, rowdata) where rowdata is
    (T, 8*nrows, 128) f32 with nrows=tile//128 rows per channel in order
    ox | oy | oz | inv_dx | inv_dy | inv_dz | tmax | pad.
    """
    nrows = tile // 128
    t_max_full = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ray_o.shape[0],))
    if perm is not None:
        feat0 = jnp.concatenate(
            [ray_o, ray_d, t_max_full[:, None]], axis=1
        )[perm]
        ray_o = feat0[:, 0:3]
        ray_d = feat0[:, 3:6]
        t_max_full = feat0[:, 6]
    ray_o, ray_d, R_out = _pad_rays(ray_o, ray_d)
    pad2 = (-ray_o.shape[0]) % (TILES_PER_STEP * tile)
    if pad2:
        ray_o = jnp.concatenate(
            [ray_o, jnp.broadcast_to(ray_o[:1], (pad2, 3))], axis=0
        )
        ray_d = jnp.concatenate([ray_d, jnp.zeros((pad2, 3), ray_d.dtype)], 0)
    R = ray_o.shape[0]
    n_tiles = R // tile
    o_col = ray_o.reshape(n_tiles, tile, 3)
    d_col = ray_d.reshape(n_tiles, tile, 3)
    tmax = jnp.concatenate(
        [t_max_full, jnp.zeros((R - R_out,), jnp.float32)]
    ).reshape(n_tiles, tile)

    # robust slab-test reciprocal: near-parallel axes behave as
    # "inside-slab passes, outside misses" (see node test below)
    inv_d = jnp.where(jnp.abs(d_col) > 1e-12, 1.0 / d_col, jnp.float32(1e30))
    feat = jnp.concatenate(
        [o_col, inv_d, tmax[:, :, None], jnp.zeros_like(tmax)[:, :, None]],
        axis=-1,
    )  # (T, tile, 8)
    # one transpose -> (T, 8, tile) -> (T, 8*nrows, 128): channel c
    # occupies rows [c*nrows, (c+1)*nrows)
    rowdata = feat.transpose(0, 2, 1).reshape(n_tiles, 8 * nrows, 128)
    # column data channel-major (T, 8, tile): HBM rows are contiguous
    # 1 KB runs (a (T,tile,8) layout is tiled T(8,128) -> every 32 B row
    # is strided and the per-step DMAs run at ~5% bandwidth); the kernel
    # transposes each tile's (8,tile) block back to ray columns once
    cols = jnp.concatenate(
        [o_col, d_col, tmax[:, :, None], jnp.zeros_like(tmax)[:, :, None]],
        axis=-1,
    ).transpose(0, 2, 1)  # (T, 8, tile)
    return R, R_out, n_tiles // TILES_PER_STEP, cols, rowdata


def _row_min(t_block, nrows=_NROWS):
    """(tile, 128) -> (nrows, 128) per-ray lane reduction (free major
    split: ray r maps to [r // 128, r % 128])."""
    return jnp.min(t_block.reshape(nrows, 128, 128), axis=-1)


def _ray_rows(row_ref, k, nrows):
    """Slice the 6 per-ray row channels (ox..inv_dz) of tile k."""
    return tuple(
        row_ref[k, c * nrows:(c + 1) * nrows, :] for c in range(6)
    )


def _pcg3d_xy01(x, y, z):
    """One pcg3d advance of uvec3(x, y, z) -> the first two outputs as
    [0,1] floats — parity with mathx.rng.rnd2d01(make_state(...))
    (random.glsl:17-28,58-62), vectorized over any i32 array shape.

    In-kernel copy in pure int32: Mosaic has no u32->f32 cast and thin
    u32 vector support, but two's-complement add/mul/xor wrap to the
    same bits as u32; the logical >>16 is an arithmetic shift + mask and
    the final u32 value converts via a signed split (i32->f32 is
    supported). The split double-rounds vs XLA's direct u32->f32 in rare
    tie cases (<= 1 ulp of jitter = 2^-24 px) — hit-identical away from
    exact silhouette-edge ties."""
    i = jnp.int32
    c1, c2 = i(1664525), i(1013904223)
    x = x * c1 + c2
    y = y * c1 + c2
    z = z * c1 + c2
    x = x + y * z
    y = y + z * x
    z = z + x * y
    lsr16 = lambda v: (v >> i(16)) & i(0xFFFF)
    x = x ^ lsr16(x)
    y = y ^ lsr16(y)
    z = z ^ lsr16(z)
    x = x + y * z
    y = y + z * x
    inv = jnp.float32(1.0 / 0xFFFFFFFF)

    def to01(v):
        vf = v.astype(jnp.float32)
        vf = jnp.where(v < 0, vf + jnp.float32(4294967296.0), vf)
        return vf * inv

    return to01(x), to01(y)


def _raygen_tile(cam_ref, i_ref, pix):
    """Generate one tile's jittered pinhole rays in-kernel.

    cam_ref (1, 16) f32 SMEM: eye(0:3) | A=2*right*thfy*aspect(3:6) |
    B=2*up*thfy(6:9) | C=fwd-rt-up2(9:12) | W(12) | H(13) so that
    d = normalize(ux*A + uy*B + C) with (ux, uy) the jittered uv — the
    per-pixel affine form of ops/rays.pinhole_rays. i_ref (1, 4) i32:
    [frame_index]. pix: (px, py, tmax) f32 arrays of a shared shape (the
    (tile, 1) column or (nrows, 128) row layout); tmax is the static
    per-lane budget from pack_pixels_np (inf real, 0 pad).

    Returns (ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax) in pix's shape.
    The jitter is the reference's per-pixel rnd2d01 camera stream
    (main.rgen), reproduced bit-for-bit so the XLA-side shading RNG
    stays in sync with the traced rays.
    """
    px, py, tmax = pix
    fi = i_ref[0, 0]
    jx, jy = _pcg3d_xy01(
        px.astype(jnp.int32),
        py.astype(jnp.int32),
        jnp.full(px.shape, fi, jnp.int32),
    )
    # pcg(16) selects the jitter model: 1 = per-pixel pcg3d (PT), 0 =
    # pixel centers + the per-frame scalar offset folded into (14, 15)
    # (the G-buffer's TAA-jittered projection, gbuffer.py uv_j)
    pcg_on = cam_ref[0, 16]
    ux = (px + pcg_on * jx + cam_ref[0, 14]) / cam_ref[0, 12]
    uy = (py + pcg_on * jy + cam_ref[0, 15]) / cam_ref[0, 13]
    dx = ux * cam_ref[0, 3] + uy * cam_ref[0, 6] + cam_ref[0, 9]
    dy = ux * cam_ref[0, 4] + uy * cam_ref[0, 7] + cam_ref[0, 10]
    dz = ux * cam_ref[0, 5] + uy * cam_ref[0, 8] + cam_ref[0, 11]
    inv_n = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dx = dx * inv_n
    dy = dy * inv_n
    dz = dz * inv_n
    ox = jnp.full(px.shape, cam_ref[0, 0], jnp.float32)
    oy = jnp.full(px.shape, cam_ref[0, 1], jnp.float32)
    oz = jnp.full(px.shape, cam_ref[0, 2], jnp.float32)
    guard = lambda d: jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.float32(1e30))
    return ox, oy, oz, dx, dy, dz, guard(dx), guard(dy), guard(dz), tmax


def _node_enter_fn(bounds_ref, rows):
    """node_enter(i, ub_row) closure over one ray tile's row data:
    per-ray slab test of BVH node i, reduced to the min entry over
    passing rays (scalar; _INF when no ray passes). Shared by the stack
    descent and the dense-cull descent's per-pop retest."""
    oxr, oyr, ozr, ixr, iyr, izr = rows

    def node_enter(i, ub_row):
        if DEBUG_FAKE_ENTER:
            return jnp.float32(0.0)
        b = 6 * i
        t0x = (bounds_ref[0, b + 0] - oxr) * ixr
        t1x = (bounds_ref[0, b + 3] - oxr) * ixr
        t0y = (bounds_ref[0, b + 1] - oyr) * iyr
        t1y = (bounds_ref[0, b + 4] - oyr) * iyr
        t0z = (bounds_ref[0, b + 2] - ozr) * izr
        t1z = (bounds_ref[0, b + 5] - ozr) * izr
        enter = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        exit_ = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        ok = (enter <= exit_) & (enter < ub_row)
        return jnp.min(jnp.where(ok, enter, _INF))

    return node_enter


def _make_descent(bounds_ref, meta_ref, rows, stack_idx, stack_enter,
                  mask_ref=None, nrows=_NROWS):
    """Build the find_leaf closure over one ray tile's row data.

    rows: (oxr, oyr, ozr, ixr, iyr, izr) — each (nrows, 128) f32, either
    sliced from the prepacked rowdata ref or computed in-kernel (the
    raygen primary variant).

    find_leaf(sp, ub_row, worst) pops the stack until a leaf whose AABB
    some ray enters before its personal upper bound is found. Returns
    (sp, leaf_cluster(-1 when exhausted)). Children are tested per-ray at
    parent pop and pushed far-first with their min entry distance.

    mask_ref (1, C) i32: per-cluster visibility (0 = culled); masked
    leaves are skipped without a slab DMA — the two-phase meshlet cull's
    draw-list analog riding the BVH kernel (draw_list_culler.comp).
    """
    oxr, oyr, ozr, ixr, iyr, izr = rows
    node_enter = _node_enter_fn(bounds_ref, rows)

    def enter_mask(i, ub_row):
        """Per-ray pass mask of node i vs the per-ray upper bounds —
        the same conservative predicate node_enter reduces, kept as the
        full (nrows, 128) row. Drives the row-skip Möller groups: a ray
        whose entry is at/behind its current best cannot improve in this
        leaf, exactly the descent's own pruning rule."""
        b = 6 * i
        t0x = (bounds_ref[0, b + 0] - oxr) * ixr
        t1x = (bounds_ref[0, b + 3] - oxr) * ixr
        t0y = (bounds_ref[0, b + 1] - oyr) * iyr
        t1y = (bounds_ref[0, b + 4] - oyr) * iyr
        t0z = (bounds_ref[0, b + 2] - ozr) * izr
        t1z = (bounds_ref[0, b + 5] - ozr) * izr
        enter = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
        )
        exit_ = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        return (enter <= exit_) & (enter < ub_row)

    def find_leaf(sp, ub_row, worst):
        def cond(c):
            sp, found, _ = c
            return (sp > 0) & (found < 0)

        def body(c):
            sp, found, fnode = c
            sp = sp - 1
            i = stack_idx[0, sp]
            en = stack_enter[0, sp]
            stale = en >= worst  # cheap packet-max skip of aged entries

            def visit(sp):
                leaf = meta_ref[0, 3 * i + 2]
                is_leaf = leaf >= 0
                emit = is_leaf
                if mask_ref is not None:
                    # culled leaf: neither emitted nor expanded — the pop
                    # loop just keeps draining (no slab DMA, no Moller)
                    emit = is_leaf & (
                        mask_ref[0, jnp.maximum(leaf, 0)] != 0
                    )

                def push_children(sp):
                    left = meta_ref[0, 3 * i]
                    right = meta_ref[0, 3 * i + 1]
                    el = node_enter(left, ub_row)
                    er = node_enter(right, ub_row)
                    left_near = el <= er
                    fi = jnp.where(left_near, right, left)
                    fe = jnp.where(left_near, er, el)
                    ni = jnp.where(left_near, left, right)
                    ne = jnp.where(left_near, el, er)

                    @pl.when(fe < _INF)
                    def _():
                        stack_idx[0, sp] = fi
                        stack_enter[0, sp] = fe

                    sp = sp + (fe < _INF).astype(jnp.int32)

                    @pl.when(ne < _INF)
                    def _():
                        stack_idx[0, sp] = ni
                        stack_enter[0, sp] = ne

                    return sp + (ne < _INF).astype(jnp.int32)

                sp = jax.lax.cond(is_leaf, lambda s: s, push_children, sp)
                return (
                    sp,
                    jnp.where(emit, leaf, found),
                    jnp.where(emit, i, fnode),
                )

            return jax.lax.cond(
                stale, lambda s: (s, found, fnode), visit, sp
            )

        sp, found, fnode = jax.lax.while_loop(
            cond, body, (sp, jnp.int32(-1), jnp.int32(-1))
        )
        return sp, found, fnode

    return find_leaf, enter_mask


def _make_descent_dense(bounds_ref, node_of_ref, caabb_ref, rows,
                        entry_scr):
    """Dense-cull descent for incoherent packets: replaces the BVH2
    stack walk (~180 pops x scalar-sync'd node tests per 128-ray bounce
    packet) with ONE vectorized all-rays x all-clusters slab pass +
    front-to-back argmin pops.

    - init_entries(cols..): per-cluster min entry distance over the
      packet, computed in (tile, 128)-cluster chunks at full VPU lane
      occupancy, written to entry_scr (8, CW) with cluster c at
      [c // CW, c % CW].
    - find_leaf(sp, ub_row, worst): argmin-pop the nearest unvisited
      cluster; a popped cluster is retested per-ray against the CURRENT
      upper bounds (node_enter on its leaf node via node_of_ref) so
      Moller work shrinks as hits land, exactly like the stack path's
      leaf test. Exhausted when the min entry >= the packet's worst
      personal bound — the same front-to-back termination the ordered
      stack descent provides, at ~3 vector->scalar syncs per VISIT
      instead of per node pop.

    caabb_ref: (8, C_pad) VMEM — cluster AABBs lane-major, rows
    [min.xyz | max.xyz | pad pad]; pad/culled clusters carry min > max
    so the slab test rejects them. node_of_ref: (1, C) i32 scalar
    prefetch mapping cluster id -> its BVH leaf node.
    """
    node_enter = _node_enter_fn(bounds_ref, rows)
    CW = entry_scr.shape[1]
    C_pad = 8 * CW
    i0 = jax.lax.broadcasted_iota(jnp.int32, (8, CW), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (8, CW), 1)
    cid = i0 * CW + i1

    def init_entries(ox, oy, oz, dx, dy, dz, tmax_col):
        ix = jnp.where(jnp.abs(dx) > 1e-12, 1.0 / dx, jnp.float32(1e30))
        iy = jnp.where(jnp.abs(dy) > 1e-12, 1.0 / dy, jnp.float32(1e30))
        iz = jnp.where(jnp.abs(dz) > 1e-12, 1.0 / dz, jnp.float32(1e30))
        for j in range(C_pad // 128):
            b = caabb_ref[0:7, 128 * j:128 * (j + 1)]  # (7, 128)
            t0x = (b[0:1] - ox) * ix
            t1x = (b[3:4] - ox) * ix
            t0y = (b[1:2] - oy) * iy
            t1y = (b[4:5] - oy) * iy
            t0z = (b[2:3] - oz) * iz
            t1z = (b[5:6] - oz) * iz
            enter = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
            )
            exit_ = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            ok = (enter <= exit_) & (enter < tmax_col) & (b[6:7] == 0.0)
            em = jnp.min(
                jnp.where(ok, enter, _INF), axis=0, keepdims=True
            )  # (1, 128)
            r = (128 * j) // CW
            cs = (128 * j) % CW
            entry_scr[r:r + 1, cs:cs + 128] = em

    def find_leaf(sp, ub_row, worst):
        def cond(c):
            return c[0]

        def body(c):
            e = entry_scr[...]
            m = jnp.min(e)

            def pop():
                cand = jnp.min(
                    jnp.where(e == m, cid, jnp.int32(0x7FFFFFFF))
                )
                entry_scr[...] = jnp.where(cid == cand, _INF, e)
                en = node_enter(node_of_ref[0, cand], ub_row)
                return jnp.where(en < _INF, cand, jnp.int32(-1))

            found = jax.lax.cond(
                (m < worst) & (m < _INF), pop, lambda: jnp.int32(-2)
            )
            return (found == -1, found)

        _, found = jax.lax.while_loop(cond, body, (True, jnp.int32(-1)))
        return sp, jnp.maximum(found, -1), jnp.int32(-1)

    return find_leaf, init_entries


_KEY_INF = 0x7F61B1E0  # key bits of _INF (3e38): masked-slot sentinel threshold


def _sort8_ascending(keys, payload=None):
    """(8, 1) int32 ascending bitonic sort — fully vectorized (sublane
    rolls + selects, no scalar extraction). Stage masks derive from an
    iota in-kernel (captured array constants are rejected by Pallas).
    `payload` (8, 1) rides along the same swaps (keys must be unique)."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    # (distance, asc-direction bit): asc(i) for stages 1-3 depends on the
    # block bit; the final 3 merge stages are globally ascending
    stages = [
        (1, (pos >> 1) & 1), (2, (pos >> 2) & 1), (1, (pos >> 2) & 1),
        (4, pos & 0), (2, pos & 0), (1, pos & 0),
    ]
    for d, desc_bit in stages:
        low = (pos & d) == 0
        partner = jnp.where(
            low, pltpu.roll(keys, 8 - d, axis=0), pltpu.roll(keys, d, axis=0)
        )
        take_min = low == (desc_bit == 0)
        new_keys = jnp.where(
            take_min, jnp.minimum(keys, partner), jnp.maximum(keys, partner)
        )
        if payload is not None:
            p_partner = jnp.where(
                low,
                pltpu.roll(payload, 8 - d, axis=0),
                pltpu.roll(payload, d, axis=0),
            )
            payload = jnp.where(new_keys != keys, p_partner, payload)
        keys = new_keys
    if payload is not None:
        return keys, payload
    return keys


def _make_descent8(nodes_ref, row_ref, kstack, cstack, cursors, k):
    """8-wide descent closure over ray tile k (see accel.bvh.pack_nodes8).

    One pop tests ALL 8 children against ALL rays in two (8, 128) VPU
    sweeps (children on sublanes, rays on lanes) instead of the BVH2's
    per-child (2, 128) tests — the round-2 profile showed the scalar pop
    machinery (not Möller) was ~75% of incoherent-trace time, so the
    descent is organized to keep vector->scalar syncs off the hot path:

    - child enters become int32 KEYS (positive-float enter bits, child
      slot in the low 3 bits: unique keys break ties exactly) and are
      bitonic-sorted ascending ENTIRELY in-register (_sort8_ascending),
      then stored as one aligned (8, 1) frame — a single VMEM write per
      expand, no per-child scalar extraction;
    - the stack is a stack of 8-entry FRAMES: the encoded child rides a
      second sorted column (cstack) so a pop is two INDEPENDENT scalar
      reads (key + enc) instead of a serial cur -> key -> parent ->
      node-table chain; cursors ride in SMEM. Missed children
      (enter = _INF) sort to the frame tail as INT32_MAX, and because
      frames are ascending, a stale pop (key >= packet-worst best-t
      bits) kills the WHOLE remaining frame in one step.
    """
    oxr = row_ref[k, 0:_NROWS, :]
    oyr = row_ref[k, 2:2 + _NROWS, :]
    ozr = row_ref[k, 4:4 + _NROWS, :]
    ixr = row_ref[k, 6:6 + _NROWS, :]
    iyr = row_ref[k, 8:8 + _NROWS, :]
    izr = row_ref[k, 10:10 + _NROWS, :]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def expand(i, ub_row, fp):
        blk = nodes_ref[i]  # (8, 8): [min.xyz | max.xyz | enc | pad]
        bmnx = blk[:, 0:1]
        bmny = blk[:, 1:2]
        bmnz = blk[:, 2:3]
        bmxx = blk[:, 3:4]
        bmxy = blk[:, 4:5]
        bmxz = blk[:, 5:6]
        en = jnp.full((8, 1), _INF, jnp.float32)
        for r in range(_NROWS):
            ox = oxr[r:r + 1, :]
            ix = ixr[r:r + 1, :]
            t0x = (bmnx - ox) * ix
            t1x = (bmxx - ox) * ix
            oy = oyr[r:r + 1, :]
            iy = iyr[r:r + 1, :]
            t0y = (bmny - oy) * iy
            t1y = (bmxy - oy) * iy
            oz = ozr[r:r + 1, :]
            iz = izr[r:r + 1, :]
            t0z = (bmnz - oz) * iz
            t1z = (bmxz - oz) * iz
            enter = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
            )
            exit_ = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            ok = (enter <= exit_) & (enter < ub_row[r:r + 1, :])
            en = jnp.minimum(
                en, jnp.min(jnp.where(ok, enter, _INF), axis=1, keepdims=True)
            )
        keys = (pltpu.bitcast(en, jnp.int32) & ~7) | slot_iota
        # missed children (en == _INF) must sort last AND always read as
        # stale: pin them to INT32_MAX (the packed _INF bits round DOWN
        # under the &~7 mask and would compare below an inf upper bound)
        keys = jnp.where(en < _INF, keys, jnp.int32(2147483647))
        encs = blk[:, 6:7].astype(jnp.int32)
        keys, encs = _sort8_ascending(keys, encs)
        fp = fp + 1
        base = pl.multiple_of(fp * 8, 8)
        kstack[pl.ds(base, 8), :] = keys
        cstack[pl.ds(base, 8), :] = encs
        cursors[0, fp] = jnp.int32(0)
        return fp

    def init_root(ub_row):
        return expand(jnp.int32(0), ub_row, jnp.int32(-1))

    def find_leaf(fp, ub_row, worst):
        del worst  # recomputed as int bits from ub_row
        worst_bits = jnp.max(pltpu.bitcast(ub_row, jnp.int32))

        def cond(c):
            fp, found = c
            return (fp >= 0) & (found < 0)

        def body(c):
            fp, found = c
            cur = cursors[0, fp]
            idx = fp * 8 + cur
            key = kstack[idx, 0]
            enc_i = cstack[idx, 0]  # independent of `key`: loads overlap
            # ascending frame: a stale head means every remaining entry
            # is at least as far -> drop the whole frame. The pop path is
            # BRANCH-FREE (selects, unconditional cursor write) except
            # the rare expand cond: lax.cond branches cost more than the
            # loads here.
            stale = (key & ~7) >= worst_bits
            cursors[0, fp] = cur + 1  # harmless when stale (frame drops)
            fp = jnp.where(stale | (cur == 7), fp - 1, fp)
            is_lf = enc_i < 0
            found = jnp.where(~stale & is_lf, -enc_i - 1, found)
            fp = jax.lax.cond(
                stale | is_lf,
                lambda f: f,
                lambda f: expand(enc_i, ub_row, f),
                fp,
            )
            return fp, found

        fp, found = jax.lax.while_loop(cond, body, (fp, jnp.int32(-1)))
        return fp, found

    return init_root, find_leaf


def _closest_body(fused, wide=False, masked=False, tile=TILE, raygen=False,
                  tile_masked=False, dense=False):
    """Kernel body shared by the plain and fused closest-hit variants.
    Processes TILES_PER_STEP ray tiles per grid step. wide=True uses the
    8-wide descent over a pack_nodes8 table instead of BVH2 SMEM scalars.
    masked=True takes a per-cluster visibility prefetch array (BVH2
    only): culled leaves are skipped in-kernel. tile: rays per packet
    (BVH2 only; 128 for incoherent wavefronts — see _prep_bvh).
    raygen=True generates jittered pinhole PRIMARY rays in-kernel from
    static pixel-coordinate layouts + camera uniforms (_raygen_tile)
    instead of reading prepacked ray data — the 2M-ray XLA prep
    (cols/rowdata relayout copies) disappears from the frame.
    tile_masked=True (raygen only) takes a per-RAY-TILE liveness
    prefetch (primary_tile_mask): dead tiles skip raygen, descent init
    and the root test entirely and just write miss rows — on a
    sparse-coverage frame ~90 % of the 16x16 pixel tiles never overlap
    any cluster AABB, and their per-tile fixed cost (~2.7 us: two
    _raygen_tile evaluations + descent init + root test + state setup)
    dominated the primary trace."""
    nrows = tile // 128
    assert wide is False or tile == TILE, "wide descent is 256-ray only"
    assert not (raygen and (wide or masked)), "raygen is BVH2, unmasked"
    assert not tile_masked or raygen, "tile mask is the raygen variant"
    assert not dense or not (
        fused or wide or masked or raygen
    ), "dense cull is the plain incoherent-packet variant"

    def kernel(*args):
        mask_ref = None
        tmask_ref = None
        node_of_ref = caabb_ref = None
        if dense:
            (bounds_ref, meta_ref, node_of_ref, cols_ref, row_ref,
             caabb_ref, tris_hbm, *rest) = args
        elif raygen and tile_masked:
            (bounds_ref, meta_ref, cam_ref, i_ref, tmask_ref, cols_ref,
             row_ref, tris_hbm, *rest) = args
        elif raygen:
            (bounds_ref, meta_ref, cam_ref, i_ref, cols_ref, row_ref,
             tris_hbm, *rest) = args
        elif wide:
            (nodes_ref, cols_ref, row_ref, tris_hbm, *rest) = args
        elif masked:
            (bounds_ref, meta_ref, mask_ref, cols_ref, row_ref, tris_hbm,
             *rest) = args
        else:
            (bounds_ref, meta_ref, cols_ref, row_ref, tris_hbm, *rest) = args
        if wide:
            if fused:
                (out, tri_slab, attr_slab, kstack, cstack, cursors,
                 attr_scr, pend, sems) = rest
            else:
                (out, tri_slab, kstack, cstack, cursors, pend, sems) = rest
        elif fused:
            (out, tri_slab, attr_slab, stack_idx, stack_enter, attr_scr,
             pend, sems) = rest
        elif dense:
            (out, tri_slab, entry_scr, pend, sems) = rest
        else:
            (out, tri_slab, stack_idx, stack_enter, pend, sems) = rest

        lane = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
        t_min = 1e-4
        rows_fetch = ROWS_PLAIN

        def get_dma(slot, c):
            # geometry rows only: the 31 attribute rows are fetched on
            # demand when a leaf improves a hit (most visits don't), so
            # the steady-state leaf traffic is 4.5 KB, not 20 KB
            return pltpu.make_async_copy(
                tris_hbm.at[c, 0:rows_fetch], tri_slab.at[slot],
                sems.at[slot]
            )

        def trace_tile(k):
            if raygen:
                # cols_ref/row_ref hold PIXEL data (3 ch: px, py, tmax)
                pc = jnp.transpose(cols_ref[k], (1, 0))  # (tile, 3)
                (ox, oy, oz, dx, dy, dz, _ix, _iy, _iz, tmax_col) = (
                    _raygen_tile(
                        cam_ref, i_ref,
                        (pc[:, 0:1], pc[:, 1:2], pc[:, 2:3]),
                    )
                )
                (oxr, oyr, ozr, _dxr, _dyr, _dzr, ixr, iyr, izr,
                 best_row0) = _raygen_tile(
                    cam_ref, i_ref,
                    (
                        row_ref[k, 0:nrows, :],
                        row_ref[k, nrows:2 * nrows, :],
                        row_ref[k, 2 * nrows:3 * nrows, :],
                    ),
                )
                rows = (oxr, oyr, ozr, ixr, iyr, izr)
            else:
                colsT = jnp.transpose(cols_ref[k], (1, 0))  # (tile, 8)
                ox = colsT[:, 0:1]
                oy = colsT[:, 1:2]
                oz = colsT[:, 2:3]
                dx = colsT[:, 3:4]
                dy = colsT[:, 4:5]
                dz = colsT[:, 5:6]
                tmax_col = colsT[:, 6:7]
                best_row0 = row_ref[k, 6 * nrows:7 * nrows, :]  # tmax rows
                rows = _ray_rows(row_ref, k, nrows)

            enter_mask = None
            if wide:
                init_root, find_leaf8 = _make_descent8(
                    nodes_ref, row_ref, kstack, cstack, cursors, k
                )

                def find_leaf(sp, ub_row, worst):
                    s, c = find_leaf8(sp, ub_row, worst)
                    return s, c, jnp.int32(-1)

                fp0 = init_root(best_row0)
                sp0, c0, node0 = find_leaf(
                    fp0, best_row0, jnp.max(best_row0)
                )
            elif dense:
                find_leaf, init_entries = _make_descent_dense(
                    bounds_ref, node_of_ref, caabb_ref, rows, entry_scr
                )
                init_entries(ox, oy, oz, dx, dy, dz, tmax_col)
                sp0, c0, node0 = find_leaf(
                    jnp.int32(1), best_row0, jnp.max(best_row0)
                )
            else:
                find_leaf, enter_mask = _make_descent(
                    bounds_ref, meta_ref, rows, stack_idx, stack_enter,
                    mask_ref=mask_ref, nrows=nrows,
                )
                # push root
                stack_idx[0, 0] = jnp.int32(0)
                stack_enter[0, 0] = jnp.float32(0.0)
                sp0, c0, node0 = find_leaf(
                    jnp.int32(1), best_row0, jnp.max(best_row0)
                )

            def run_pipeline():
                if fused:
                    attr_scr[...] = jnp.zeros((tile, 12), jnp.float32)
                # prime the slab ring: descend up to DMA_DEPTH-1 leaves
                # ahead before the first Moller so every wait has ~3
                # visits of issued-ahead DMA behind it
                pend[0, 0] = c0

                def pcond(c):
                    n, sp = c
                    return (n < DMA_DEPTH - 1) & (sp > 0)

                def pbody(c):
                    n, sp = c
                    sp, nxt, nnode = find_leaf(
                        sp, best_row0, jnp.max(best_row0)
                    )

                    if not DEBUG_NO_DMA:
                        @pl.when(nxt >= 0)
                        def _():
                            pend[0, n] = nxt
                            get_dma(n, nxt).start()
                    else:
                        @pl.when(nxt >= 0)
                        def _():
                            pend[0, n] = nxt

                    return n + (nxt >= 0).astype(jnp.int32), sp

                n0, spp = jax.lax.while_loop(
                    pcond, pbody, (jnp.int32(1), sp0)
                )

                def cond(state):
                    return state[0] < state[1]  # consumed < found

                def body(state):
                    if fused:
                        j_, n, sp, best_t, best_row, best_tri = state
                    else:
                        (j_, n, sp, best_t, best_row, best_tri, best_u,
                         best_v) = state
                    # top up the ring: descend to one more leaf while the
                    # head slab is in flight (entry invariant n-j_ <=
                    # DMA_DEPTH-1 keeps the write slot disjoint from the
                    # consuming + pending slots)
                    sp, nxt, _ = find_leaf(sp, best_row, jnp.max(best_row))

                    if not DEBUG_NO_DMA:
                        @pl.when(nxt >= 0)
                        def _():
                            pend[0, jax.lax.rem(n, DMA_DEPTH)] = nxt
                            get_dma(jax.lax.rem(n, DMA_DEPTH), nxt).start()
                    else:
                        @pl.when(nxt >= 0)
                        def _():
                            pend[0, jax.lax.rem(n, DMA_DEPTH)] = nxt

                    n = n + (nxt >= 0).astype(jnp.int32)
                    slot = jax.lax.rem(j_, DMA_DEPTH)
                    cur = pend[0, slot]
                    if not DEBUG_NO_DMA:
                        get_dma(slot, cur).wait()
                    # f16 slabs (pack_tris_full dtype) convert to f32
                    # in registers; identity for f32 arenas
                    slab = tri_slab[slot].astype(jnp.float32)

                    if DEBUG_NO_MOLLER or DEBUG_NO_DMA:
                        hit = jnp.zeros((tile, 128), jnp.bool_)
                        t = jnp.full((tile, 128), _INF, jnp.float32)
                        u = jnp.zeros((tile, 128), jnp.float32)
                        v = jnp.zeros((tile, 128), jnp.float32)
                    else:
                        hit, t, u, v = _moller_block(
                            slab[0:9], ox, oy, oz, dx, dy, dz, t_min, best_t
                        )
                    tmin = jnp.min(t, axis=1, keepdims=True)
                    improved = tmin < best_t
                    is_best = t == tmin
                    j = jnp.min(
                        jnp.where(is_best, lane, 128), axis=1, keepdims=True
                    )

                    if fused:
                        @pl.when(jnp.any(improved))
                        def _():
                            acopy = pltpu.make_async_copy(
                                tris_hbm.at[cur, ROWS_PLAIN:ROWS_FULL],
                                attr_slab.at[0],
                                sems.at[DMA_DEPTH],
                            )
                            acopy.start()
                            sel = is_best & (lane == j)
                            selw = sel.astype(jnp.float32)
                            w_b = 1.0 - u - v
                            acopy.wait()
                            aslab = attr_slab[0].astype(jnp.float32)

                            def interp(r0, r1, r2):
                                a = (
                                    w_b * aslab[r0 - 9:r0 - 8, :]
                                    + u * aslab[r1 - 9:r1 - 8, :]
                                    + v * aslab[r2 - 9:r2 - 8, :]
                                )
                                return jnp.sum(a * selw, axis=1, keepdims=True)

                            attrs = [
                                interp(9 + c, 12 + c, 15 + c) for c in range(3)
                            ] + [
                                interp(18 + c, 22 + c, 26 + c) for c in range(4)
                            ] + [
                                interp(30 + c, 32 + c, 34 + c) for c in range(2)
                            ]
                            mat_row = jnp.sum(
                                aslab[27:28, :] * selw, axis=1, keepdims=True
                            )
                            lod_row = jnp.sum(
                                aslab[28:29, :] * selw, axis=1, keepdims=True
                            )
                            new_attr = jnp.concatenate(
                                attrs
                                + [
                                    mat_row,
                                    lod_row,
                                    jnp.zeros((tile, 1), jnp.float32),
                                ],
                                axis=1,
                            )
                            attr_scr[...] = jnp.where(
                                improved, new_attr, attr_scr[...]
                            )
                    else:
                        sel = is_best & (lane == j)
                        u_sel = jnp.sum(
                            jnp.where(sel, u, 0.0), axis=1, keepdims=True
                        )
                        v_sel = jnp.sum(
                            jnp.where(sel, v, 0.0), axis=1, keepdims=True
                        )
                        best_u = jnp.where(improved, u_sel, best_u)
                        best_v = jnp.where(improved, v_sel, best_v)

                    best_tri = jnp.where(
                        improved, cur * CLUSTER_PAD + j, best_tri
                    )
                    best_t = jnp.where(improved, tmin, best_t)
                    best_row = jnp.minimum(best_row, _row_min(t, nrows))
                    if fused:
                        return (j_ + 1, n, sp, best_t, best_row, best_tri)
                    return (
                        j_ + 1, n, sp, best_t, best_row, best_tri, best_u,
                        best_v,
                    )

                init_common = (
                    jnp.int32(0),
                    n0,
                    spp,
                    tmax_col,
                    best_row0,
                    jnp.full((tile, 1), -1, jnp.int32),
                )
                # tri ids ride as exact f32 (< 2^24 triangles; packed
                # single-output keeps VMEM block count down)
                if fused:
                    state = jax.lax.while_loop(cond, body, init_common)
                    _, _, _, best_t, _, best_tri = state
                    out[k] = jnp.transpose(
                        jnp.concatenate(
                            [
                                best_t,
                                best_tri.astype(jnp.float32),
                                attr_scr[...],
                                jnp.zeros((tile, 2), jnp.float32),
                            ],
                            axis=1,
                        ),
                        (1, 0),
                    )
                else:
                    init = init_common + (
                        jnp.zeros((tile, 1), jnp.float32),
                        jnp.zeros((tile, 1), jnp.float32),
                    )
                    state = jax.lax.while_loop(cond, body, init)
                    j_, _, _, best_t, _, best_tri, best_u, best_v = state
                    pad_rows = jnp.zeros((tile, 4), jnp.float32)
                    if DEBUG_VISITS:
                        pad_rows = jnp.concatenate(
                            [
                                jnp.zeros((tile, 3), jnp.float32),
                                jnp.full(
                                    (tile, 1), 1.0, jnp.float32
                                ) * j_.astype(jnp.float32),
                            ],
                            axis=1,
                        )
                    out[k] = jnp.transpose(
                        jnp.concatenate(
                            [
                                best_t,
                                best_tri.astype(jnp.float32),
                                best_u,
                                best_v,
                                pad_rows,
                            ],
                            axis=1,
                        ),
                        (1, 0),
                    )

            # most tiles in a sparse frame never reach a leaf: write the
            # miss defaults and skip the whole pipeline (its vector loop
            # setup costs ~4 us/tile otherwise)
            @pl.when(c0 < 0)
            def _():
                out[k] = jnp.transpose(
                    jnp.concatenate(
                        [
                            tmax_col,
                            jnp.full((tile, 1), -1.0, jnp.float32),
                            jnp.zeros(
                                (tile, 14 if fused else 6), jnp.float32
                            ),
                        ],
                        axis=1,
                    ),
                    (1, 0),
                )

            @pl.when(c0 >= 0)
            def _():
                # NB must be skipped with DEBUG_NO_DMA: an outstanding
                # (started, never-waited) DMA at kernel exit wedges the
                # device
                if not DEBUG_NO_DMA:
                    get_dma(0, c0).start()
                run_pipeline()

        def tile_body(k, _):
            if tile_masked:
                # per-step (1, K, 128) VMEM block (NOT scalar prefetch
                # + program_id: the Pallas HLO interpreter used by the
                # CPU tests has no program_id lowering)
                live = tmask_ref[0, k, 0]

                @pl.when(live == 0)
                def _():
                    # dead tile (its ray bundle provably overlaps no
                    # cluster AABB): miss rows written channel-major —
                    # t = the static per-lane budget (inf real, 0 pad),
                    # tri = -1, attrs 0 — with no raygen, descent init,
                    # root test or transpose
                    out[k] = jnp.concatenate(
                        [
                            cols_ref[k, 2:3, :],
                            jnp.full((1, tile), -1.0, jnp.float32),
                            jnp.zeros(
                                (14 if fused else 6, tile), jnp.float32
                            ),
                        ],
                        axis=0,
                    )

                @pl.when(live != 0)
                def _():
                    trace_tile(k)
            else:
                trace_tile(k)
            return 0

        jax.lax.fori_loop(0, TILES_PER_STEP, tile_body, 0)

    return kernel


def _in_specs(tile=TILE):
    K = TILES_PER_STEP
    nrows = tile // 128
    return [
        pl.BlockSpec((K, 8, tile), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, 8 * nrows, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]


def _out_block(width=1, tile=TILE):
    # channel-major (K, ch, tile): lane-dense output rows
    return pl.BlockSpec(
        (TILES_PER_STEP, width, tile),
        lambda i, *_: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )


@partial(jax.jit, static_argnames=("tile", "packed"))
def trace_closest_bvh(
    tris_packed: jnp.ndarray,  # (C, 9, 128)
    bounds: jnp.ndarray,  # (N, 6) f32
    meta: jnp.ndarray,  # (N, 3) i32
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    skip_mask=None,
    perm=None,
    tile: int = TILE,
    packed: bool = False,
):
    """BVH closest-hit; same contract as trace.trace_closest (t_min fixed
    at 1e-4 in-kernel like the round-1 kernels). skip_mask: see
    trace_closest_bvh_full. perm: optional ray sort fused into ray prep
    (results come back in SORTED order). packed=True returns the raw
    (R, 8) rows so a caller inverting a sort pays one gather
    (unpack_hit8 recovers the dict)."""
    del t_min
    masked = skip_mask is not None
    R, R_out, n_steps, cols, rowdata = _prep_bvh(
        ray_o, ray_d, t_max, perm, tile=tile
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if masked else 2,
        grid=(n_steps,),
        in_specs=_in_specs(tile),
        out_specs=[_out_block(8, tile)],
        scratch_shapes=[
            pltpu.VMEM((DMA_DEPTH, ROWS_PLAIN, 128), tris_packed.dtype),
            pltpu.SMEM((1, STACK_CAP), jnp.int32),
            pltpu.SMEM((1, STACK_CAP), jnp.float32),
            pltpu.SMEM((1, DMA_DEPTH), jnp.int32),
            pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
        ],
    )
    n_tiles = n_steps * TILES_PER_STEP
    prefetch = [bounds.reshape(1, -1), meta.reshape(1, -1)]
    if masked:
        prefetch.append(skip_mask.astype(jnp.int32).reshape(1, -1))
    (out,) = pl.pallas_call(
        _closest_body(fused=False, masked=masked, tile=tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, tile), jnp.float32),
        ],
    )(*prefetch, cols, rowdata, tris_packed)
    out = out.transpose(0, 2, 1).reshape(R, 8)[:R_out]
    if packed:
        return out
    return unpack_hit8(out)


def _dense_aux(C, bounds, meta, skip_mask=None):
    """(node_of, caabb8) for the dense-cull kernels: cluster -> BVH leaf
    node map (1, C) i32 and cluster AABBs laid out lane-major (8, C_pad)
    [min.xyz | max.xyz | pad], C_pad a 1024-multiple so the kernel's
    (8, C_pad/8) entry scratch has 128-aligned rows. Culled (skip_mask)
    and pad clusters carry min > max (always-fail slab)."""
    N = meta.shape[0]
    leaf = meta[:, 2]
    is_leaf = leaf >= 0
    idx = jnp.where(is_leaf, leaf, C)
    node_of = jnp.zeros((C,), jnp.int32).at[idx].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    caabb = bounds[node_of]  # (C, 6) — the BVH's own leaf boxes
    # dead clusters carry an explicit flag row (row 6): an inverted
    # min>max box does NOT fail the slab test (it is min/max-symmetric),
    # and a popped pad cluster would DMA out of tris_hbm bounds
    dead = jnp.zeros((C,), jnp.float32)
    if skip_mask is not None:
        dead = jnp.where(skip_mask.astype(bool), dead, 1.0)
    C_pad = -(-C // 1024) * 1024
    if C_pad > C:
        caabb = jnp.concatenate(
            [caabb, jnp.zeros((C_pad - C, 6), jnp.float32)], axis=0
        )
        dead = jnp.concatenate(
            [dead, jnp.ones((C_pad - C,), jnp.float32)], axis=0
        )
    caabb8 = jnp.concatenate(
        [
            caabb.T,
            dead.reshape(1, -1),
            jnp.zeros((1, C_pad), jnp.float32),
        ],
        axis=0,
    )
    return node_of.reshape(1, -1), caabb8


@partial(jax.jit, static_argnames=("tile", "packed"))
def trace_closest_bvh_dense(
    tris_packed: jnp.ndarray,  # (C, >=9, 128)
    bounds: jnp.ndarray,  # (N, 6) f32
    meta: jnp.ndarray,  # (N, 3) i32
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    skip_mask=None,
    perm=None,
    tile: int = 128,
    packed: bool = False,
):
    """Closest-hit over the dense-cull descent (_make_descent_dense):
    same contract/results as trace_closest_bvh, built for INCOHERENT
    bounce wavefronts where the stack walk's per-pop scalar syncs
    dominate (~50 of the 57.8 ms bounce-closest share of the 1080p PT
    frame; Möller is ~6 ms)."""
    del t_min
    C = tris_packed.shape[0]
    node_of, caabb8 = _dense_aux(C, bounds, meta, skip_mask)
    C_pad = caabb8.shape[1]
    R, R_out, n_steps, cols, rowdata = _prep_bvh(
        ray_o, ray_d, t_max, perm, tile=tile
    )
    in_specs = _in_specs(tile)
    in_specs.insert(
        2,
        pl.BlockSpec(
            (8, C_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=[_out_block(8, tile)],
        scratch_shapes=[
            pltpu.VMEM((DMA_DEPTH, ROWS_PLAIN, 128), tris_packed.dtype),
            pltpu.VMEM((8, C_pad // 8), jnp.float32),
            pltpu.SMEM((1, DMA_DEPTH), jnp.int32),
            pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
        ],
    )
    n_tiles = n_steps * TILES_PER_STEP
    (out,) = pl.pallas_call(
        _closest_body(fused=False, tile=tile, dense=True),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, tile), jnp.float32),
        ],
    )(
        bounds.reshape(1, -1),
        meta.reshape(1, -1),
        node_of,
        cols,
        rowdata,
        caabb8,
        tris_packed,
    )
    out = out.transpose(0, 2, 1).reshape(R, 8)[:R_out]
    if packed:
        return out
    return unpack_hit8(out)


@partial(jax.jit, static_argnames=("packed", "tile"))
def trace_closest_bvh_full(
    tris_packed: jnp.ndarray,  # (C, 40, 128)
    bounds: jnp.ndarray,
    meta: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    perm=None,
    packed: bool = False,
    skip_mask=None,
    tile: int = TILE,
):
    """BVH closest-hit + fused world-space attribute interpolation; same
    contract as ops/trace_pallas_full.trace_closest_full.

    perm: optional ray sort permutation fused into ray prep (results come
    back in SORTED order). packed=True returns the raw (R, 16) rows so a
    caller inverting a sort pays one gather instead of seven.
    skip_mask (C,) bool/i32: per-cluster visibility — culled clusters'
    leaves are skipped in-kernel (two-phase meshlet culling riding the
    BVH kernel instead of the flat masked-AABB fallback).
    """
    del t_min
    masked = skip_mask is not None
    R, R_out, n_steps, cols, rowdata = _prep_bvh(
        ray_o, ray_d, t_max, perm, tile=tile
    )
    scratch = [
        pltpu.VMEM((DMA_DEPTH, ROWS_PLAIN, 128), tris_packed.dtype),
        pltpu.VMEM((1, ROWS_FULL - ROWS_PLAIN, 128), tris_packed.dtype),
        pltpu.SMEM((1, STACK_CAP), jnp.int32),
        pltpu.SMEM((1, STACK_CAP), jnp.float32),
        pltpu.VMEM((tile, 12), jnp.float32),
        pltpu.SMEM((1, DMA_DEPTH), jnp.int32),
        pltpu.SemaphoreType.DMA((DMA_DEPTH + 1,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if masked else 2,
        grid=(n_steps,),
        in_specs=_in_specs(tile),
        out_specs=[_out_block(16, tile)],
        scratch_shapes=scratch,
    )
    n_tiles = n_steps * TILES_PER_STEP
    prefetch = [bounds.reshape(1, -1), meta.reshape(1, -1)]
    if masked:
        prefetch.append(skip_mask.astype(jnp.int32).reshape(1, -1))
    (out,) = pl.pallas_call(
        _closest_body(fused=True, masked=masked, tile=tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 16, tile), jnp.float32),
        ],
    )(*prefetch, cols, rowdata, tris_packed)
    out = out.transpose(0, 2, 1).reshape(R, 16)[:R_out]
    if packed:
        return out
    return unpack_hit16(out)


def pack_pixels_np(px, py, tile=TILE):
    """numpy pixel coords -> the raygen kernel's static layouts.

    Returns (cols (T, 3, tile) f32, rows (T, 3*nrows, 128) f32, R0) with
    channel order px | py | tmax (inf real, 0 pad). Static per pixel
    list, so callers cache the packed arrays across frames — the
    per-frame 2M-ray prep (_prep_bvh's cols/rowdata relayouts, ~13 ms of
    T(4,128)->T(8,128) copies in the 1080p PT xplane) is replaced by two
    constant uploads."""
    import numpy as np

    nrows = tile // 128
    R0 = int(px.shape[0])
    pad = (-R0) % (TILES_PER_STEP * tile)
    pxp = np.concatenate(
        [np.asarray(px, np.float32), np.full(pad, -1.0, np.float32)]
    )
    pyp = np.concatenate(
        [np.asarray(py, np.float32), np.full(pad, -1.0, np.float32)]
    )
    tm = np.concatenate(
        [np.full(R0, np.inf, np.float32), np.zeros(pad, np.float32)]
    )
    T = pxp.shape[0] // tile
    cols = np.stack(
        [pxp.reshape(T, tile), pyp.reshape(T, tile), tm.reshape(T, tile)],
        axis=1,
    )
    rows = cols.reshape(T, 3 * nrows, 128)
    return cols, rows, R0


def tile_px_bounds_np(px, py, tile=TILE):
    """Static per-ray-tile pixel bounds for primary_tile_mask:
    (T, 4) f32 [px_min, px_max, py_min, py_max] over each tile's REAL
    lanes (pad lanes excluded; all-pad tiles get an empty min>max range
    so the mask test rejects them). T matches pack_pixels_np."""
    import numpy as np

    R0 = int(px.shape[0])
    pad = (-R0) % (TILES_PER_STEP * tile)
    big = np.float32(1e9)
    pxp = np.concatenate(
        [np.asarray(px, np.float32), np.full(pad, big, np.float32)]
    )
    pyp = np.concatenate(
        [np.asarray(py, np.float32), np.full(pad, big, np.float32)]
    )
    T = pxp.shape[0] // tile
    pxt = pxp.reshape(T, tile)
    pyt = pyp.reshape(T, tile)
    real = pxt < big
    px_min = np.where(real, pxt, big).min(axis=1)
    px_max = np.where(real, pxt, -big).max(axis=1)
    py_min = np.where(real, pyt, big).min(axis=1)
    py_max = np.where(real, pyt, -big).max(axis=1)
    return np.stack([px_min, px_max, py_min, py_max], axis=1).astype(
        np.float32
    )


def primary_tile_mask(cam_vec, tile_px, wc_min, wc_max, skip_mask=None):
    """(T,) i32 conservative per-ray-tile liveness for the raygen
    kernel: interval-arithmetic slab test of each 16x16 pixel tile's
    pinhole ray bundle against EVERY cluster AABB (hits only occur
    inside cluster AABBs, so a tile overlapping none is provably all-
    miss — tighter than the kernel's own root test, which keeps tiles
    alive anywhere inside the scene's bounding box).

    cam_vec: primary_cam_vec uniforms — directions are affine in the
    jittered (ux, uy), so each tile's direction range per axis is the
    interval hull of its pixel-bounds corners (+1 px of jitter when the
    per-pixel pcg jitter is on); unnormalized directions are fine (slab
    overlap is invariant under positive scaling). skip_mask (C,): the
    per-cluster culling mask — culled clusters are excluded, so the
    tile mask composes with two-phase culling."""
    from .intersect import packet_aabb_overlap_2d

    eye = cam_vec[0, 0:3]
    A = cam_vec[0, 3:6]
    B = cam_vec[0, 6:9]
    Cv = cam_vec[0, 9:12]
    W = cam_vec[0, 12]
    H = cam_vec[0, 13]
    offx = cam_vec[0, 14]
    offy = cam_vec[0, 15]
    pcg_on = cam_vec[0, 16]
    T = tile_px.shape[0]
    ux_lo = (tile_px[:, 0] + offx) / W
    ux_hi = (tile_px[:, 1] + pcg_on + offx) / W
    uy_lo = (tile_px[:, 2] + offy) / H
    uy_hi = (tile_px[:, 3] + pcg_on + offy) / H

    d_lo, d_hi = [], []
    for ax in range(3):
        ua = jnp.minimum(ux_lo * A[ax], ux_hi * A[ax])
        ub = jnp.maximum(ux_lo * A[ax], ux_hi * A[ax])
        va = jnp.minimum(uy_lo * B[ax], uy_hi * B[ax])
        vb = jnp.maximum(uy_lo * B[ax], uy_hi * B[ax])
        d_lo.append(ua + va + Cv[ax])
        d_hi.append(ub + vb + Cv[ax])
    d_lo = jnp.stack(d_lo, axis=-1)
    d_hi = jnp.stack(d_hi, axis=-1)
    o = jnp.broadcast_to(eye, (T, 3))
    bmin, bmax = wc_min, wc_max
    if skip_mask is not None:
        live_c = skip_mask.astype(bool)[:, None]
        bmin = jnp.where(live_c, wc_min, 1.0)
        bmax = jnp.where(live_c, wc_max, 0.0)  # min > max: excluded
    ov = packet_aabb_overlap_2d(
        o, o, d_lo, d_hi, bmin, bmax, jnp.full((T,), _INF, jnp.float32)
    )
    real = tile_px[:, 1] >= tile_px[:, 0]
    return (jnp.any(ov, axis=1) & real).astype(jnp.int32)


def primary_cam_vec(cam: dict, width, height, pixel_jitter=None,
                    y_offset=0.0):
    """(1, 24) f32 camera uniforms for the raygen kernel: the affine
    per-pixel form of ops/rays.pinhole_rays (see _raygen_tile).

    pixel_jitter=None selects the PT per-pixel pcg jitter; a (2,) NDC
    jitter (cam["current_jitter"]) selects pixel centers shifted by the
    per-frame TAA jitter (render/gbuffer.py's uv_j), folded into the
    constant pixel offset. y_offset renders a band of a `height`-tall
    frame starting at that absolute row (gbuffer.py band sharding);
    `height` is then the FULL frame height."""
    c2c = cam["camera_to_clip"]
    w2c = cam["world_to_camera"]
    aspect = c2c[1, 1] / c2c[0, 0]
    thfy = 1.0 / c2c[1, 1]
    rt = w2c[0, :3] * thfy * aspect
    up2 = w2c[1, :3] * thfy
    fwd = -w2c[2, :3]
    w = jnp.asarray(width, jnp.float32)
    h = jnp.asarray(height, jnp.float32)
    if pixel_jitter is None:
        offx, offy, pcg_on = jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0)
    else:
        j = jnp.asarray(pixel_jitter, jnp.float32)
        offx = 0.5 + 0.5 * j[0] * w
        offy = 0.5 - 0.5 * j[1] * h + jnp.asarray(y_offset, jnp.float32)
        pcg_on = jnp.float32(0.0)
    tail = jnp.stack(
        [w, h, offx, offy, pcg_on]
        + [jnp.float32(0.0)] * 7
    )
    return jnp.concatenate(
        [
            cam["eye"].astype(jnp.float32),
            (2.0 * rt).astype(jnp.float32),
            (2.0 * up2).astype(jnp.float32),
            (fwd - rt - up2).astype(jnp.float32),
            tail,
        ]
    ).reshape(1, 24)


@jax.jit
def trace_primary_bvh_full(
    tris_packed: jnp.ndarray,  # (C, 40, 128)
    bounds: jnp.ndarray,
    meta: jnp.ndarray,
    pix_cols: jnp.ndarray,  # (T, 3, tile) f32 from pack_pixels_np
    pix_rows: jnp.ndarray,  # (T, 3*nrows, 128) f32
    cam_vec: jnp.ndarray,  # (1, 24) f32 from primary_cam_vec
    i_vec: jnp.ndarray,  # (1, 4) i32 [frame_index, 0, 0, 0]
    tile_mask: jnp.ndarray | None = None,  # (T,) i32 primary_tile_mask
):
    """Fused closest-hit over in-kernel-generated jittered pinhole
    primary rays (trace_closest_bvh_full contract, packed rows out).

    The jitter is the reference's per-pixel rnd2d01 camera jitter
    (main.rgen), bit-parity with the XLA-side RNG stream. Returns
    (T*tile, 16) packed hit rows — callers slice [:R] and unpack_hit16.
    tile_mask: optional per-ray-tile liveness (primary_tile_mask) —
    masked-dead tiles skip raygen/descent and write miss rows.
    """
    T, _, tile = pix_cols.shape
    nrows = tile // 128
    n_steps = T // TILES_PER_STEP
    tile_masked = tile_mask is not None
    in_specs = [
        pl.BlockSpec(
            (TILES_PER_STEP, 3, tile),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (TILES_PER_STEP, 3 * nrows, 128),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if tile_masked:
        # per-step (1, K, 128) VMEM block so the kernel indexes it with
        # the LOCAL tile id (no program_id — unsupported by the Pallas
        # HLO interpreter the CPU tests run under); the lane broadcast
        # satisfies Mosaic's (8, 128)-divisible block tiling (a (1, K)
        # block is rejected at TPU lowering)
        in_specs.insert(
            0,
            pl.BlockSpec(
                (1, TILES_PER_STEP, 128),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=[_out_block(16, tile)],
        scratch_shapes=[
            pltpu.VMEM((DMA_DEPTH, ROWS_PLAIN, 128), tris_packed.dtype),
            pltpu.VMEM((1, ROWS_FULL - ROWS_PLAIN, 128), tris_packed.dtype),
            pltpu.SMEM((1, STACK_CAP), jnp.int32),
            pltpu.SMEM((1, STACK_CAP), jnp.float32),
            pltpu.VMEM((tile, 12), jnp.float32),
            pltpu.SMEM((1, DMA_DEPTH), jnp.int32),
            pltpu.SemaphoreType.DMA((DMA_DEPTH + 1,)),
        ],
    )
    inputs = [pix_cols, pix_rows, tris_packed]
    if tile_masked:
        inputs.insert(
            0,
            jnp.broadcast_to(
                tile_mask.astype(jnp.int32).reshape(
                    n_steps, TILES_PER_STEP, 1
                ),
                (n_steps, TILES_PER_STEP, 128),
            ),
        )
    (out,) = pl.pallas_call(
        _closest_body(fused=True, tile=tile, raygen=True,
                      tile_masked=tile_masked),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, 16, tile), jnp.float32),
        ],
    )(
        bounds.reshape(1, -1),
        meta.reshape(1, -1),
        cam_vec,
        i_vec.astype(jnp.int32),
        *inputs,
    )
    return out.transpose(0, 2, 1).reshape(T * tile, 16)


def pack_hit16(hit):
    """hit dict -> (R, 16) packed rows (unpack_hit16's inverse; exact —
    tri/material ids fit f32's 24-bit integer range). Lets callers that
    produced a dict (the XLA tracer, the alpha-retrace loop) feed the
    packed-row chunk pipelines in render/pt.py."""
    R = hit["t"].shape[0]
    return jnp.concatenate(
        [
            hit["t"][:, None],
            hit["tri"].astype(jnp.float32)[:, None],
            hit["normal"],
            hit["tangent"],
            hit["uv"],
            hit["material"].astype(jnp.float32)[:, None],
            hit["tri_lod"][:, None],
            jnp.zeros((R, 3), jnp.float32),
        ],
        axis=1,
    )


def unpack_hit8(out):
    """(R, 8) packed plain-closest rows -> geometry-only hit dict."""
    return {
        "t": out[:, 0],
        "tri": out[:, 1].astype(jnp.int32),
        "u": out[:, 2],
        "v": out[:, 3],
    }


def attr_rows_from_packed(tris_packed_full):
    """(C, 40, 128) fused slabs -> (C*128, 32) per-TRIANGLE attribute
    rows (channels = slab rows 9:38 + pad), row-gatherable by global tri
    id (c * CLUSTER_PAD + lane). Feeds attrs_from_hit_rows: incoherent
    bounce wavefronts trace through the PLAIN 9-row kernel (no per-visit
    attribute DMA/interpolation) and interpolate attributes once, at the
    winning hit only. Computed once per geometry in
    trace.prepare_geometry (a 12 MB transpose), not per frame."""
    C = tris_packed_full.shape[0]
    a = tris_packed_full[:, ROWS_PLAIN:38, :].astype(jnp.float32)
    a = jnp.transpose(a, (0, 2, 1)).reshape(C * 128, 29)
    return jnp.concatenate(
        [a, jnp.zeros((C * 128, 3), jnp.float32)], axis=1
    )


def attrs_from_hit_rows(attr_rows, hit):
    """Deferred attribute interpolation for plain-kernel hits: ONE
    (R, 32) row gather by winning tri id + the same barycentric blend
    the fused kernel runs per improved visit (_closest_body interp:
    slab rows 9:38 = n0 n1 n2 | t0 t1 t2 | uv0 uv1 uv2 | material |
    lod). Returns the trace_closest_bvh_full hit dict.

    For incoherent wavefronts the fused kernel's per-visit attribute
    work (31-row DMA + ~12 (tile, 128) interp/select ops on nearly
    every union visit) is pure overhead — only the final hit's
    attributes are observable. Deferring them to one row gather
    (measured ~42 ns/row on v5e) trades ~1.4 ms per 32k-ray chunk for
    the per-visit cost on every one of its ~27 union visits/packet."""
    tri = jnp.maximum(hit["tri"], 0)
    a = attr_rows[tri]  # (R, 32)
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


def unpack_hit16(out):
    """(R, 16) packed closest-full rows -> hit dict (see above)."""
    return {
        "t": out[:, 0],
        "tri": out[:, 1].astype(jnp.int32),
        "normal": out[:, 2:5],
        "tangent": out[:, 5:9],
        "uv": out[:, 9:11],
        "material": out[:, 11].astype(jnp.int32),
        "tri_lod": out[:, 12],
    }


def _any_body(wide=False, tile=TILE, dense=False):
    nrows = tile // 128
    assert wide is False or tile == TILE, "wide descent is 256-ray only"
    assert not (wide and dense)

    def kernel(*args):
        if wide:
            (nodes_ref, cols_ref, row_ref, tris_hbm, occ_out, tri_slab,
             kstack, cstack, cursors, pend, sems) = args
        elif dense:
            (bounds_ref, meta_ref, node_of_ref, cols_ref, row_ref,
             caabb_ref, tris_hbm, occ_out, tri_slab, entry_scr, pend,
             sems) = args
        else:
            (bounds_ref, meta_ref, cols_ref, row_ref, tris_hbm, occ_out,
             tri_slab, stack_idx, stack_enter, pend, sems) = args
        t_min = 0.1  # shadow-ray tMin parity (main.rgen shadow())

        def get_dma(slot, c):
            # geometry rows only: accept any slab with rows 0-8 (the
            # 40-row fused arena included — the scratch is 9 rows)
            return pltpu.make_async_copy(
                tris_hbm.at[c, 0:ROWS_PLAIN], tri_slab.at[slot], sems.at[slot]
            )

        def tile_body(k, _):
            colsT = jnp.transpose(cols_ref[k], (1, 0))  # (tile, 8)
            ox = colsT[:, 0:1]
            oy = colsT[:, 1:2]
            oz = colsT[:, 2:3]
            dx = colsT[:, 3:4]
            dy = colsT[:, 4:5]
            dz = colsT[:, 5:6]
            tmax = colsT[:, 6:7]
            tmax_row = row_ref[k, 6 * nrows:7 * nrows, :]

            if wide:
                init_root, find_leaf8 = _make_descent8(
                    nodes_ref, row_ref, kstack, cstack, cursors, k
                )

                def find_leaf(sp, ub_row, worst):
                    s_, c_ = find_leaf8(sp, ub_row, worst)
                    return s_, c_, jnp.int32(-1)

                fp0 = init_root(tmax_row)
                sp0, c0, _ = find_leaf(fp0, tmax_row, jnp.max(tmax_row))
            elif dense:
                find_leaf, init_entries = _make_descent_dense(
                    bounds_ref, node_of_ref, caabb_ref,
                    _ray_rows(row_ref, k, nrows), entry_scr,
                )
                init_entries(ox, oy, oz, dx, dy, dz, tmax)
                sp0, c0, _ = find_leaf(
                    jnp.int32(1), tmax_row, jnp.max(tmax_row)
                )
            else:
                find_leaf, _enter_mask = _make_descent(
                    bounds_ref, meta_ref, _ray_rows(row_ref, k, nrows),
                    stack_idx, stack_enter, nrows=nrows,
                )
                stack_idx[0, 0] = jnp.int32(0)
                stack_enter[0, 0] = jnp.float32(0.0)
                sp0, c0, _ = find_leaf(
                    jnp.int32(1), tmax_row, jnp.max(tmax_row)
                )

            def run_pipeline():
                # prime the slab ring (see _closest_body)
                pend[0, 0] = c0

                def pcond(c):
                    n, sp = c
                    return (n < DMA_DEPTH - 1) & (sp > 0)

                def pbody(c):
                    n, sp = c
                    sp, nxt, _ = find_leaf(
                        sp, tmax_row, jnp.max(tmax_row)
                    )

                    @pl.when(nxt >= 0)
                    def _():
                        pend[0, n] = nxt
                        get_dma(n, nxt).start()

                    return n + (nxt >= 0).astype(jnp.int32), sp

                n0, spp = jax.lax.while_loop(
                    pcond, pbody, (jnp.int32(1), sp0)
                )

                def cond(state):
                    return state[0] < state[1]

                def body(state):
                    j_, n, sp, occ, ub_row = state
                    sp, nxt, _ = find_leaf(sp, ub_row, jnp.max(ub_row))

                    @pl.when(nxt >= 0)
                    def _():
                        pend[0, jax.lax.rem(n, DMA_DEPTH)] = nxt
                        get_dma(jax.lax.rem(n, DMA_DEPTH), nxt).start()

                    n = n + (nxt >= 0).astype(jnp.int32)
                    slot = jax.lax.rem(j_, DMA_DEPTH)
                    cur = pend[0, slot]
                    get_dma(slot, cur).wait()
                    hit, t, _, _ = _moller_block(
                        tri_slab[slot][0:9].astype(jnp.float32),
                        ox, oy, oz, dx, dy, dz, t_min, tmax,
                    )
                    occ = occ | jnp.any(hit, axis=1, keepdims=True).astype(
                        jnp.int32
                    )
                    # occluded rays drop their upper bound to 0 -> they stop
                    # steering the descent; when all rays occlude, worst hits 0
                    # and the stack drains via the stale skip
                    hit_row = jnp.max(
                        hit.astype(jnp.float32).reshape(nrows, 128, 128), axis=-1
                    )
                    ub_row = jnp.where(hit_row > 0.0, 0.0, ub_row)
                    return (j_ + 1, n, sp, occ, ub_row)

                init = (
                    jnp.int32(0),
                    n0,
                    spp,
                    jnp.zeros((tile, 1), jnp.int32),
                    tmax_row,
                )
                _, _, _, occ, _ = jax.lax.while_loop(cond, body, init)
                occ_out[k] = jnp.transpose(occ, (1, 0))

            @pl.when(c0 < 0)
            def _():
                occ_out[k] = jnp.zeros((1, tile), jnp.int32)

            @pl.when(c0 >= 0)
            def _():
                get_dma(0, c0).start()
                run_pipeline()

            return 0

        jax.lax.fori_loop(0, TILES_PER_STEP, tile_body, 0)

    return kernel


@partial(jax.jit, static_argnames=("tile",))
def trace_any_bvh(
    tris_packed: jnp.ndarray,  # (C, 9, 128) (or any slab with rows 0-8)
    bounds: jnp.ndarray,
    meta: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    perm=None,
    tile: int = TILE,
):
    """BVH any-hit (shadow rays): occluded mask, per-ray termination.
    perm: optional ray sort permutation fused into ray prep (occlusion
    mask comes back in SORTED order)."""
    del t_min
    R, R_out, n_steps, cols, rowdata = _prep_bvh(
        ray_o, ray_d, t_max, perm, tile=tile
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=_in_specs(tile),
        out_specs=[_out_block(1, tile)],
        scratch_shapes=[
            pltpu.VMEM((DMA_DEPTH, ROWS_PLAIN, 128), tris_packed.dtype),
            pltpu.SMEM((1, STACK_CAP), jnp.int32),
            pltpu.SMEM((1, STACK_CAP), jnp.float32),
            pltpu.SMEM((1, DMA_DEPTH), jnp.int32),
            pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
        ],
    )
    n_tiles = n_steps * TILES_PER_STEP
    (occ,) = pl.pallas_call(
        _any_body(wide=False, tile=tile),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32)],
    )(bounds.reshape(1, -1), meta.reshape(1, -1), cols, rowdata, tris_packed)
    return (occ.reshape(R) > 0)[:R_out]


@partial(jax.jit, static_argnames=("tile",))
def trace_any_bvh_dense(
    tris_packed: jnp.ndarray,  # (C, >=9, 128)
    bounds: jnp.ndarray,
    meta: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    skip_mask=None,
    perm=None,
    tile: int = 128,
):
    """Any-hit over the dense-cull descent; same contract as
    trace_any_bvh (occluded mask, SORTED order under perm)."""
    del t_min
    C = tris_packed.shape[0]
    node_of, caabb8 = _dense_aux(C, bounds, meta, skip_mask)
    C_pad = caabb8.shape[1]
    R, R_out, n_steps, cols, rowdata = _prep_bvh(
        ray_o, ray_d, t_max, perm, tile=tile
    )
    in_specs = _in_specs(tile)
    in_specs.insert(
        2,
        pl.BlockSpec(
            (8, C_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=[_out_block(1, tile)],
        scratch_shapes=[
            pltpu.VMEM((DMA_DEPTH, ROWS_PLAIN, 128), tris_packed.dtype),
            pltpu.VMEM((8, C_pad // 8), jnp.float32),
            pltpu.SMEM((1, DMA_DEPTH), jnp.int32),
            pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
        ],
    )
    n_tiles = n_steps * TILES_PER_STEP
    (occ,) = pl.pallas_call(
        _any_body(tile=tile, dense=True),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32)],
    )(
        bounds.reshape(1, -1),
        meta.reshape(1, -1),
        node_of,
        cols,
        rowdata,
        caabb8,
        tris_packed,
    )
    return (occ.reshape(R) > 0)[:R_out]


# ---------------------------------------------------------------------------
# 8-wide entries (pack_nodes8 tables). Same contracts as the BVH2 entries.
# ---------------------------------------------------------------------------

FRAMES8 = 48  # frame-stack depth: >= bvh8 depth (~bvh2 depth guard + 8)


def _in_specs8(n8):
    K = TILES_PER_STEP
    return [
        pl.BlockSpec(
            (n8, 8, 8), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((K, 8, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, 16, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]


def _wide_grid(n_steps, n8, out_width, fused, tris_dtype=jnp.float32):
    scratch = [
        pltpu.VMEM((DMA_DEPTH, ROWS_PLAIN, 128), tris_dtype),
    ]
    if fused:
        scratch.append(pltpu.VMEM((1, ROWS_FULL - ROWS_PLAIN, 128), tris_dtype))
    scratch += [
        pltpu.VMEM((FRAMES8 * 8, 1), jnp.int32),  # sorted key frames
        pltpu.VMEM((FRAMES8 * 8, 1), jnp.int32),  # sorted enc frames
        pltpu.SMEM((1, FRAMES8), jnp.int32),  # frame cursor
    ]
    if fused:
        scratch.append(pltpu.VMEM((TILE, 12), jnp.float32))
    scratch.append(pltpu.SMEM((1, DMA_DEPTH), jnp.int32))
    scratch.append(
        pltpu.SemaphoreType.DMA((DMA_DEPTH + 1 if fused else DMA_DEPTH,))
    )
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=_in_specs8(n8),
        out_specs=[
            pl.BlockSpec(
                (TILES_PER_STEP, out_width, TILE),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        scratch_shapes=scratch,
    )


@jax.jit
def trace_closest_bvh8(
    tris_packed: jnp.ndarray,  # (C, 9, 128)
    nodes8: jnp.ndarray,  # (N8, 8, 8) f32 from accel.bvh.pack_nodes8
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    perm=None,
):
    """8-wide BVH closest-hit; contract of trace_closest_bvh."""
    del t_min
    R, R_out, n_steps, cols, rowdata = _prep_bvh(ray_o, ray_d, t_max, perm)
    grid_spec = _wide_grid(n_steps, nodes8.shape[0], 8, fused=False,
                           tris_dtype=tris_packed.dtype)
    n_tiles = n_steps * TILES_PER_STEP
    (out,) = pl.pallas_call(
        _closest_body(fused=False, wide=True),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 8, TILE), jnp.float32)],
    )(nodes8, cols, rowdata, tris_packed)
    out = out.transpose(0, 2, 1).reshape(R, 8)[:R_out]
    return {
        "t": out[:, 0],
        "tri": out[:, 1].astype(jnp.int32),
        "u": out[:, 2],
        "v": out[:, 3],
    }


@partial(jax.jit, static_argnames=("packed",))
def trace_closest_bvh8_full(
    tris_packed: jnp.ndarray,  # (C, 40, 128)
    nodes8: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    perm=None,
    packed: bool = False,
):
    """8-wide BVH closest-hit + fused attribute interpolation; contract
    of trace_closest_bvh_full."""
    del t_min
    R, R_out, n_steps, cols, rowdata = _prep_bvh(ray_o, ray_d, t_max, perm)
    grid_spec = _wide_grid(n_steps, nodes8.shape[0], 16, fused=True,
                           tris_dtype=tris_packed.dtype)
    n_tiles = n_steps * TILES_PER_STEP
    (out,) = pl.pallas_call(
        _closest_body(fused=True, wide=True),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 16, TILE), jnp.float32)],
    )(nodes8, cols, rowdata, tris_packed)
    out = out.transpose(0, 2, 1).reshape(R, 16)[:R_out]
    if packed:
        return out
    return unpack_hit16(out)


@jax.jit
def trace_any_bvh8(
    tris_packed: jnp.ndarray,
    nodes8: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    perm=None,
):
    """8-wide BVH any-hit; contract of trace_any_bvh."""
    del t_min
    R, R_out, n_steps, cols, rowdata = _prep_bvh(ray_o, ray_d, t_max, perm)
    grid_spec = _wide_grid(n_steps, nodes8.shape[0], 1, fused=False,
                           tris_dtype=tris_packed.dtype)
    n_tiles = n_steps * TILES_PER_STEP
    (occ,) = pl.pallas_call(
        _any_body(wide=True),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 1, TILE), jnp.int32)],
    )(nodes8, cols, rowdata, tris_packed)
    return (occ.reshape(R) > 0)[:R_out]
