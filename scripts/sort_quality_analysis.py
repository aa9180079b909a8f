#!/usr/bin/env python
"""Union-visit quality of alternative bounce-wavefront orderings.

The packet tracer's cost is visits/packet x per-visit cost; per-ray only
2.6 leaf visits are needed but the (origin cluster, octant)-sorted
128-ray packets union-visit 26.6. This sweeps sort keys offline (numpy
BFS, one TPU primary trace) to see how much ordering alone can recover.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080
TILE = 128


def octant_bits(d, bits=3):
    ad = np.abs(d)
    denom = np.maximum(ad.sum(1), 1e-20)
    ox, oy = d[:, 0] / denom, d[:, 1] / denom
    fold = d[:, 2] < 0
    ox2 = np.where(fold, (1 - np.abs(oy)) * np.sign(ox), ox)
    oy2 = np.where(fold, (1 - np.abs(ox)) * np.sign(oy), oy)
    n = 1 << bits
    bx = np.clip(((ox2 * 0.5 + 0.5) * n).astype(np.int64), 0, n - 1)
    by = np.clip(((oy2 * 0.5 + 0.5) * n).astype(np.int64), 0, n - 1)
    return (bx * n + by) * 2 + fold.astype(np.int64)


def morton3(q, bits):
    out = np.zeros(q.shape[0], np.int64)
    for b in range(bits):
        for a in range(3):
            out |= ((q[:, a] >> b) & 1).astype(np.int64) << (3 * b + a)
    return out


def main():
    import jax

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

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
    uv = (
        jnp.stack([jnp.asarray(px_np), jnp.asarray(py_np)], -1).astype(
            jnp.float32
        )
        + 0.5
    ) / jnp.array([WIDTH, HEIGHT], jnp.float32)
    o, d0 = pinhole_rays(cam, uv)
    hit = jax.block_until_ready(
        trace_bvh.trace_closest_bvh_full(
            packed40, jnp.asarray(bounds), jnp.asarray(meta), o, d0,
            1e-4, jnp.inf,
        )
    )
    tri = np.asarray(hit["tri"])
    live = tri >= 0
    t = np.asarray(hit["t"])[live]
    n = np.asarray(hit["normal"])[live]
    o_np = np.asarray(o)[live]
    d_np = np.asarray(d0)[live]
    pos = o_np + t[:, None] * d_np
    cluster = (tri[live] // trace.CLUSTER_PAD).astype(np.int64)

    rs = np.random.RandomState(0)
    u1, u2 = rs.rand(pos.shape[0]), rs.rand(pos.shape[0])
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    tx = np.cross(
        n, np.where(np.abs(n[:, 2:3]) < 0.9, [0, 0, 1.0], [1.0, 0, 0])
    )
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
    R0 = o2.shape[0]
    print(f"bounce rays: {R0}")

    # quantized position for Morton keys
    lo, hi = pos.min(0), pos.max(0)
    q = ((o2 - lo) / np.maximum(hi - lo, 1e-9) * 63).astype(np.int64)
    q = np.clip(q, 0, 63)
    qd = np.clip(((d * 0.5 + 0.5) * 7).astype(np.int64), 0, 7)

    hit_cluster = (
        np.where(np.asarray(hit2["tri"]) >= 0, np.asarray(hit2["tri"]), 0)
        // trace.CLUSTER_PAD
    ).astype(np.int64)
    hit_miss = (np.asarray(hit2["tri"]) < 0).astype(np.int64)
    keys = {
        "cluster*128+oct3 (current)": cluster * 128 + octant_bits(d, 3),
        "ORACLE hit-cluster": hit_miss * (1 << 40) + hit_cluster,
        "ORACLE hitc*128+oct3": hit_miss * (1 << 40)
        + hit_cluster * 128
        + octant_bits(d, 3),
        "ORACLE hitc+parentc": hit_miss * (1 << 40)
        + hit_cluster * 4096
        + cluster,
        "morton9(pos)*128+oct3": morton3(
            np.clip(
                ((o2 - lo) / np.maximum(hi - lo, 1e-9) * 511).astype(
                    np.int64
                ),
                0,
                511,
            ),
            9,
        )
        * 128
        + octant_bits(d, 3),
        "cluster*2048+oct5": cluster * 2048 + octant_bits(d, 5),
        "oct3*4096+cluster": octant_bits(d, 3) * 4096 + cluster,
        "morton6(pos)": morton3(q, 6),
        "morton6(pos)*128+oct3": morton3(q, 6) * 128 + octant_bits(d, 3),
        "oct3*2^18+morton6(pos)": octant_bits(d, 3) * (1 << 18)
        + morton3(q, 6),
        "morton_posdir(interleave)": morton3(
            np.concatenate([q[:, :2], qd[:, :1] * 8], axis=1), 6
        )
        * 64
        + q[:, 2],
    }

    def visits_for(order):
        o_s, d_s, th_s = o2[order], d[order], t_hit[order]
        R = R0
        pad = (-R) % TILE
        if pad:
            o_s = np.concatenate([o_s, np.broadcast_to(o_s[:1], (pad, 3))])
            d_s = np.concatenate([d_s, np.zeros((pad, 3), d_s.dtype)])
            th_s = np.concatenate([th_s, np.zeros(pad, th_s.dtype)])
            R += pad
        inv_d = 1.0 / np.where(np.abs(d_s) > 1e-12, d_s, 1e-12)
        npk = R // TILE
        tot = 0
        for p in range(npk):
            sl = slice(p * TILE, (p + 1) * TILE)
            op, ip, tp = o_s[sl], inv_d[sl], th_s[sl]
            work = [(0, np.ones(TILE, bool))]
            while work:
                node, act = work.pop()
                bmin, bmax = bounds[node, 0:3], bounds[node, 3:6]
                t0 = (bmin[None] - op) * ip
                t1 = (bmax[None] - op) * ip
                lo_ = np.minimum(t0, t1).max(axis=1)
                hi_ = np.maximum(t0, t1).min(axis=1)
                m = act & (hi_ >= np.maximum(lo_, 1e-4)) & (lo_ <= tp)
                if not m.any():
                    continue
                left, right, leaf = meta[node]
                if leaf >= 0:
                    tot += 1
                else:
                    work.append((left, m))
                    work.append((right, m))
        return tot / npk

    for name, key in keys.items():
        order = np.argsort(key, kind="stable")
        print(f"{name:28s} union visits/packet {visits_for(order):6.1f}")


if __name__ == "__main__":
    main()
