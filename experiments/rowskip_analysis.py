#!/usr/bin/env python
"""Row-group sparsity of leaf entry within sorted bounce packets.

The packet kernel's Möller block puts rays on ROWS (sublanes) and the
leaf's 128 tris on LANES; each union-visited leaf costs a full
(TILE, 128) Möller even though only the entering rays can hit. If the
entering rays of a visit concentrate in few 8/16/32-row groups (they
should — the wavefront is (origin cluster, octant)-sorted), a per-group
`@pl.when` skip turns union-visit Möller cost into ~per-ray-visit cost.

Reports, over the real FlightHelmet bounce set:
  visits/packet union (baseline Möller blocks)
  mean occupied row groups per visit at G in {8, 16, 32}
  -> projected Möller reduction factor per G.

Serial TPU use (primary trace only); analysis is numpy.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080
TILE = 128


def main():
    import jax

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from prosper_tpu.mathx import rng as prng
    from prosper_tpu.ops import trace, trace_bvh
    from prosper_tpu.ops.rays import pinhole_rays
    from prosper_tpu.ops.trace_pallas_full import pack_tris_full
    from prosper_tpu.scene.world import World

    world = World(SCENE)
    frame = world.frame_arrays(0.0)
    static = {
        k: jnp.asarray(v)
        for k, v in world.static_scene_arrays().items()
        if k != "materials"
    }
    frame_dev = {
        k: jnp.asarray(v)
        for k, v in frame.items()
        if k not in ("scene_camera", "bvh_depth", "lights")
    }
    bounds = np.asarray(frame_dev["bvh_bounds"])
    meta = np.asarray(frame_dev["bvh_meta"])
    packed40 = pack_tris_full(static, frame_dev)

    cam = {
        k: jnp.asarray(v)
        for k, v in world.make_camera((WIDTH, HEIGHT)).uniforms().items()
    }
    px_np, py_np, _ = trace.block_pixel_order(WIDTH, HEIGHT)
    px, py = jnp.asarray(px_np), jnp.asarray(py_np)
    uv = (jnp.stack([px, py], -1).astype(jnp.float32) + 0.5) / jnp.array(
        [WIDTH, HEIGHT], jnp.float32
    )
    o, d0 = pinhole_rays(cam, uv)
    hit = jax.block_until_ready(
        trace_bvh.trace_closest_bvh_full(
            packed40, jnp.asarray(bounds), jnp.asarray(meta), o, d0,
            1e-4, jnp.inf,
        )
    )
    tri = np.asarray(hit["tri"])
    live = tri >= 0
    print(f"live rays: {int(live.sum())}")
    t = np.asarray(hit["t"])[live]
    n = np.asarray(hit["normal"])[live]
    o_np = np.asarray(o)[live]
    d_np = np.asarray(d0)[live]
    pos = o_np + t[:, None] * d_np
    cluster = (tri[live] // trace.CLUSTER_PAD).astype(np.int32)

    # cosine-hemisphere bounce dirs (analysis stream, not parity)
    rs = np.random.RandomState(0)
    u1, u2 = rs.rand(pos.shape[0]), rs.rand(pos.shape[0])
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    tx = np.cross(n, np.where(np.abs(n[:, 2:3]) < 0.9, [0, 0, 1.0], [1.0, 0, 0]))
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-12)
    ty = np.cross(n, tx)
    d = (
        tx * (r * np.cos(phi))[:, None]
        + ty * (r * np.sin(phi))[:, None]
        + n * np.sqrt(np.maximum(1 - u1, 0.0))[:, None]
    )
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    o2 = pos + n * 1e-3

    hit2 = jax.block_until_ready(
        trace_bvh.trace_closest_bvh_full(
            packed40, jnp.asarray(bounds), jnp.asarray(meta),
            jnp.asarray(o2), jnp.asarray(d), 1e-4, jnp.inf,
        )
    )
    t2 = np.asarray(hit2["t"])
    t_hit = np.where(np.isfinite(t2), t2, 1e30).astype(np.float32)

    # sort like render/pt.py: (origin cluster, direction octant)
    ad = np.abs(d)
    denom = np.maximum(ad.sum(1), 1e-20)
    ox, oy = d[:, 0] / denom, d[:, 1] / denom
    fold = d[:, 2] < 0
    ox2 = np.where(fold, (1 - np.abs(oy)) * np.sign(ox), ox)
    oy2 = np.where(fold, (1 - np.abs(ox)) * np.sign(oy), oy)
    bx = np.clip(((ox2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    by = np.clip(((oy2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    octant = (bx * 8 + by) * 2 + fold.astype(np.int32)
    order = np.argsort(cluster * 128 + octant, kind="stable")
    o_s, d_s, th_s = o2[order], d[order], t_hit[order]
    R = o_s.shape[0]
    pad = (-R) % TILE
    if pad:
        o_s = np.concatenate([o_s, np.broadcast_to(o_s[:1], (pad, 3))])
        d_s = np.concatenate([d_s, np.zeros((pad, 3), d_s.dtype)])
        th_s = np.concatenate([th_s, np.zeros(pad, th_s.dtype)])
        R += pad
    inv_d = 1.0 / np.where(np.abs(d_s) > 1e-12, d_s, 1e-12)
    npk = R // TILE

    # per-packet BFS, collecting the entry MASK of each visited leaf
    groups = (8, 16, 32)
    tot_visits = 0
    occ = {g: 0 for g in groups}
    entering = 0
    for p in range(npk):
        sl = slice(p * TILE, (p + 1) * TILE)
        op, ip, tp = o_s[sl], inv_d[sl], th_s[sl]
        work = [(0, np.ones(TILE, bool))]
        while work:
            node, act = work.pop()
            bmin, bmax = bounds[node, 0:3], bounds[node, 3:6]
            t0 = (bmin[None] - op) * ip
            t1 = (bmax[None] - op) * ip
            lo = np.minimum(t0, t1).max(axis=1)
            hi = np.maximum(t0, t1).min(axis=1)
            m = act & (hi >= np.maximum(lo, 1e-4)) & (lo <= tp)
            if not m.any():
                continue
            left, right, leaf = meta[node]
            if leaf >= 0:
                tot_visits += 1
                entering += int(m.sum())
                for g in groups:
                    occ[g] += int(m.reshape(-1, g).any(axis=1).sum())
            else:
                work.append((left, m))
                work.append((right, m))

    print(f"packets: {npk}  union visits/packet: {tot_visits / npk:.1f}")
    print(f"entering rays/visit: {entering / tot_visits:.1f} of {TILE}")
    for g in groups:
        full = TILE // g
        mean_occ = occ[g] / tot_visits
        print(
            f"G={g:3d}: occupied groups/visit {mean_occ:5.2f} of {full}"
            f"  -> Moller reduction x{full / mean_occ:4.1f}"
        )


if __name__ == "__main__":
    main()
