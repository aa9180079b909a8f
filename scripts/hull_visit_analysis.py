#!/usr/bin/env python
"""How loose is a packet-HULL cluster cull vs the per-ray union?

The BVH2 descent's per-node cost is dominated by per-iteration
vector->scalar syncs (in-situ: descent+update = 50.4 of the 57.8 ms
bounce-closest trace; Möller only 6.4 ms). A descent driven by the
packet's interval HULL (pure scalar SMEM math, no vector tests) would
remove those syncs but visit every cluster the hull enters. This script
measures that count on the real FlightHelmet bounce set at tile=128:
mean/percentile hull-candidate clusters per packet (no t pruning)
vs the measured per-ray union of 32.7.
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
    import jax.numpy as jnp

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()

    from prosper_tpu.ops import trace, trace_bvh
    from prosper_tpu.ops.intersect import packet_aabb_overlap_2d
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
    fd = {
        k: jnp.asarray(v)
        for k, v in frame.items()
        if k not in ("scene_camera", "bvh_depth", "lights")
    }
    packed40 = jax.block_until_ready(pack_tris_full(static, fd))
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
    ray_o, ray_d = pinhole_rays(cam, uv)
    hit = jax.block_until_ready(
        trace_bvh.trace_closest_bvh_full(
            packed40, fd["bvh_bounds"], fd["bvh_meta"], ray_o, ray_d,
            0.0, jnp.inf,
        )
    )

    t = np.asarray(hit["t"])
    tri = np.asarray(hit["tri"])
    n = np.asarray(hit["normal"])
    o = np.asarray(ray_o) + t[:, None] * np.asarray(ray_d)
    idx = np.nonzero(tri >= 0)[0]
    rng = np.random.default_rng(0)
    nrm = n[idx]
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    u1, u2 = rng.random(idx.size), rng.random(idx.size)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    tang = np.cross(nrm, np.where(np.abs(nrm[:, :1]) < 0.9,
                                  [[1.0, 0, 0]], [[0, 1.0, 0]]))
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    bit = np.cross(nrm, tang)
    d = (
        tang * (r * np.cos(phi))[:, None]
        + bit * (r * np.sin(phi))[:, None]
        + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]
    ).astype(np.float32)
    o2 = (o[idx] + 1e-4 * nrm).astype(np.float32)
    cluster = tri[idx] // trace.CLUSTER_PAD

    pad = (-idx.size) % 2048
    o2 = np.pad(o2, ((0, pad), (0, 0)))
    d2 = np.pad(d, ((0, pad), (0, 0)))
    tmax = np.pad(np.full(idx.size, np.inf, np.float32), (0, pad))
    cl = np.pad(cluster, (0, pad))

    # production sort
    ad = np.abs(d2)
    denom = np.maximum(ad.sum(1), 1e-20)
    ox, oy = d2[:, 0] / denom, d2[:, 1] / denom
    fold = d2[:, 2] < 0
    ox2 = np.where(fold, (1 - np.abs(oy)) * np.sign(ox), ox)
    oy2 = np.where(fold, (1 - np.abs(ox)) * np.sign(oy), oy)
    bx = np.clip(((ox2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    by = np.clip(((oy2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    oct_ = (bx * 8 + by) * 2 + fold.astype(np.int32)
    key = np.where(tmax > 0, cl * 128 + oct_, 2**30)
    perm = np.argsort(key, kind="stable")
    o_s, d_s, tm_s = o2[perm], d2[perm], tmax[perm]

    T = o_s.shape[0] // TILE
    o_t = o_s.reshape(T, TILE, 3)
    d_t = d_s.reshape(T, TILE, 3)
    tm_t = tm_s.reshape(T, TILE)
    live_t = (tm_t > 0).any(axis=1)
    o_lo = jnp.asarray(o_t.min(axis=1))
    o_hi = jnp.asarray(o_t.max(axis=1))
    # dead rays (tmax 0, direction from the original set) widen the
    # hull; production would mask them out of the hull like the sort
    # key does. Mask here too.
    w = (tm_t > 0)[..., None]
    d_lo = jnp.asarray(np.where(w, d_t, np.inf).min(axis=1))
    d_hi = jnp.asarray(np.where(w, d_t, -np.inf).max(axis=1))
    ol = jnp.asarray(np.where(w, o_t, np.inf).min(axis=1))
    oh = jnp.asarray(np.where(w, o_t, -np.inf).max(axis=1))

    ov = packet_aabb_overlap_2d(
        ol, oh, d_lo, d_hi, fd["wc_aabb_min_w"], fd["wc_aabb_max_w"],
        jnp.full((T,), 3e38, jnp.float32),
    )
    counts = np.asarray(ov.sum(axis=1))[np.asarray(live_t)]
    print(f"live packets: {counts.size} (tile={TILE}), clusters "
          f"{fd['wc_aabb_min_w'].shape[0]}")
    print(f"hull candidates/packet: mean {counts.mean():.1f}  "
          f"p50 {np.percentile(counts, 50):.0f}  "
          f"p90 {np.percentile(counts, 90):.0f}  "
          f"p99 {np.percentile(counts, 99):.0f}  max {counts.max()}")
    print("per-ray-union reference: 32.7 visits/packet (t-pruned)")


if __name__ == "__main__":
    main()
