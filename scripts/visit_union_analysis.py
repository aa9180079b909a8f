#!/usr/bin/env python
"""Host-side union-visit analysis of the real bounce-ray set.

For the FlightHelmet bounce rays (cosine hemisphere at primary hits,
coherence-sorted like render/pt.py), computes for each ray the set of
BVH leaves whose AABB the ray enters within [t_min, t_hit] (the
candidate set an ordered single-ray traversal must visit), then reports

  per-ray mean candidates            (the SBVH / overlap quality metric)
  union over sorted blocks of S rays (the packet waste at TILE=S)

for S in {64, 128, 256}. cost(TILE) ~ u(S)/S * c(S) decides whether
shrinking the packet pays. Runs the primary trace on whatever backend is
default (TPU) but the analysis itself is numpy.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080


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
    bounds = np.asarray(frame["bvh_bounds"])
    meta = np.asarray(frame["bvh_meta"])
    packed40 = jax.block_until_ready(pack_tris_full(static, frame_dev))

    cam_obj = world.make_camera((WIDTH, HEIGHT))
    cam = {k: jnp.asarray(v) for k, v in cam_obj.uniforms().items()}
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
            packed40, jnp.asarray(bounds), jnp.asarray(meta),
            ray_o, ray_d, 0.0, jnp.inf,
        )
    )

    t = np.asarray(hit["t"])
    tri = np.asarray(hit["tri"])
    n = np.asarray(hit["normal"])
    o = np.asarray(ray_o) + t[:, None] * np.asarray(ray_d)
    idx = np.nonzero(tri >= 0)[0]
    rng = np.random.default_rng(0)
    nrm = n[idx] / np.maximum(
        np.linalg.norm(n[idx], axis=1, keepdims=True), 1e-9
    )
    u1, u2 = rng.random(idx.size), rng.random(idx.size)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    tang = np.cross(
        nrm, np.where(np.abs(nrm[:, :1]) < 0.9, [[1.0, 0, 0]], [[0, 1.0, 0]])
    )
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    bit = np.cross(nrm, tang)
    d = (
        tang * (r * np.cos(phi))[:, None]
        + bit * (r * np.sin(phi))[:, None]
        + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]
    ).astype(np.float32)
    o2 = (o[idx] + 1e-4 * nrm).astype(np.float32)
    cluster = tri[idx] // trace.CLUSTER_PAD

    # second trace for the true t_hit of the bounce rays
    hit2 = jax.block_until_ready(
        trace_bvh.trace_closest_bvh_full(
            packed40, jnp.asarray(bounds), jnp.asarray(meta),
            jnp.asarray(o2), jnp.asarray(d), 1e-4, jnp.inf,
        )
    )
    t2 = np.asarray(hit2["t"])
    t_hit = np.where(np.isfinite(t2), t2, 1e30).astype(np.float32)

    # sort like the kernel: (origin cluster, direction octant)
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
    print(f"bounce rays: {R}")
    if os.environ.get("UNBOUNDED"):
        # candidate count an enumeration pass would see BEFORE any
        # intersection shrinks t (the leaf-major phase-1 upper bound)
        th_s = np.full_like(th_s, 1e30)
        print("(unbounded t: enumeration-pass candidate counts)")

    # per-ray candidate leaves: vectorized BFS over nodes
    inv_d = 1.0 / np.where(np.abs(d_s) > 1e-12, d_s, 1e-12)
    leaf_sets = np.zeros((R,), object)
    candidates = [[] for _ in range(R)]
    stack = [0]
    active0 = np.arange(R)

    def slab_enter(node, act):
        bmin = bounds[node, 0:3]
        bmax = bounds[node, 3:6]
        t0 = (bmin[None] - o_s[act]) * inv_d[act]
        t1 = (bmax[None] - o_s[act]) * inv_d[act]
        lo = np.minimum(t0, t1).max(axis=1)
        hi = np.maximum(t0, t1).min(axis=1)
        return act[(hi >= np.maximum(lo, 1e-4)) & (lo <= th_s[act])]

    work = [(0, active0)]
    per_ray_count = np.zeros(R, np.int64)
    # block unions
    sizes = (64, 128, 256)
    unions = {s: [set() for _ in range(-(-R // s))] for s in sizes}
    while work:
        node, act = work.pop()
        act = slab_enter(node, act)
        if act.size == 0:
            continue
        left, right, leaf = meta[node]
        if leaf >= 0:
            per_ray_count[act] += 1
            for s in sizes:
                for b in np.unique(act // s):
                    unions[s][b].add(node)
        else:
            work.append((left, act))
            work.append((right, act))

    print(f"per-ray candidate leaves: mean {per_ray_count.mean():.1f} "
          f"p50 {np.median(per_ray_count):.0f} "
          f"p90 {np.percentile(per_ray_count, 90):.0f}")
    for s in sizes:
        u = np.array([len(x) for x in unions[s]], np.float64)
        print(
            f"TILE={s:3d}: union visits/packet mean {u.mean():6.1f} "
            f"(share factor {per_ray_count.mean() * s / u.mean():5.1f} "
            f"rays/visit of the {s} in the packet)"
        )


if __name__ == "__main__":
    main()
