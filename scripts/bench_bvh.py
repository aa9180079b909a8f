#!/usr/bin/env python
"""Micro-bench: BVH-descent kernels (ops/trace_bvh.py) vs the round-1
flat cull-list kernels, on FlightHelmet primary + bounce-like rays.

Run serially on the TPU (one process at a time):
  python scripts/bench_bvh.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080


def timed(fn, force, n=3):
    fn()  # warm
    force()
    t0 = time.perf_counter()
    for _ in range(n):
        force(fn())
    return (time.perf_counter() - t0) / n


def main():
    phases = set(sys.argv[1:]) or {"closest", "any", "bounce"}
    import jax
    import jax.numpy as jnp

    from prosper_tpu.accel.bvh import build_bvh, pack_nodes
    from prosper_tpu.ops import trace, trace_bvh, trace_pallas
    from prosper_tpu.ops.trace_pallas_full import pack_tris_full, trace_closest_full
    from prosper_tpu.ops.rays import pinhole_rays
    from prosper_tpu.scene.world import World

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
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
    wc_min = frame_dev["wc_aabb_min_w"]
    wc_max = frame_dev["wc_aabb_max_w"]
    print("clusters:", wc_min.shape[0], flush=True)

    bvh = build_bvh(frame["wc_aabb_min_w"], frame["wc_aabb_max_w"], max_leaf_size=1)
    bounds_np, meta_np = pack_nodes(bvh)
    print("bvh nodes:", len(bounds_np), "depth:", bvh.depth, flush=True)
    bounds = jnp.asarray(bounds_np)
    meta = jnp.asarray(meta_np)

    cam_obj = world.make_camera((WIDTH, HEIGHT))
    cam = {k: jnp.asarray(v) for k, v in cam_obj.uniforms().items()}
    px_np, py_np, _ = trace.block_pixel_order(WIDTH, HEIGHT)
    uv = (
        jnp.stack([jnp.asarray(px_np), jnp.asarray(py_np)], axis=-1).astype(
            jnp.float32
        )
        + 0.5
    ) / jnp.array([WIDTH, HEIGHT], jnp.float32)
    ray_o, ray_d = pinhole_rays(cam, uv)
    ray_o = jax.block_until_ready(ray_o)

    tris = trace.world_triangles(static, frame_dev)
    packed9 = jax.block_until_ready(trace_pallas.pack_tris(tris))
    packed40 = jax.block_until_ready(pack_tris_full(static, frame_dev))

    R = ray_o.shape[0]
    print(f"rays: {R/1e6:.2f}M", flush=True)

    # ---- closest full: old vs new ----
    if "closest" not in phases and "any" not in phases and "bounce" not in phases:
        return
    old = lambda: trace_closest_full(
        packed40, wc_min, wc_max, ray_o, ray_d, 0.0, jnp.inf
    )
    new = lambda: trace_bvh.trace_closest_bvh_full(
        packed40, bounds, meta, ray_o, ray_d, 0.0, jnp.inf
    )
    h_new = new()
    if "closest" in phases:
        h_old = old()
    if "closest" in phases:
        agree = float(jnp.mean((h_old["tri"] == h_new["tri"]).astype(jnp.float32)))
        t_ok = float(
            jnp.mean(
                (
                    jnp.abs(h_old["t"] - h_new["t"])
                    <= 1e-3 * jnp.maximum(jnp.abs(h_old["t"]), 1.0)
                )
                | ~jnp.isfinite(h_old["t"])
            ).astype(jnp.float32)
        )
        hitrate = float(jnp.mean((h_new["tri"] >= 0).astype(jnp.float32)))
        print(f"primary agree tri: {agree:.5f}  t: {t_ok:.5f}  hitrate {hitrate:.3f}", flush=True)

        t_old = timed(old, lambda x=None: float(old()["t"].min()))
        t_new = timed(new, lambda x=None: float(new()["t"].min()))
        print(f"closest_full primary: old {t_old*1e3:.1f} ms  new {t_new*1e3:.1f} ms", flush=True)

    # ---- any (shadow-like rays from hit points toward a light) ----
    hit_t = jnp.where(jnp.isfinite(h_new["t"]), h_new["t"], 0.0)
    origin = ray_o + ray_d * (hit_t[:, None] * 0.99)
    lpos = jnp.array([2.0, 3.0, 2.0], jnp.float32)
    sd = lpos[None, :] - origin
    dist = jnp.linalg.norm(sd, axis=1, keepdims=True)
    sd = sd / jnp.maximum(dist, 1e-6)
    smax = jnp.where(h_new["tri"] >= 0, dist[:, 0], 0.0)

    old_any = lambda: trace_pallas.trace_any_pallas(
        packed9, wc_min, wc_max, origin, sd, 0.1, smax
    )
    new_any = lambda: trace_bvh.trace_any_bvh(
        packed9, bounds, meta, origin, sd, 0.1, smax
    )
    if "any" in phases:
        o1, o2 = old_any(), new_any()
        agree = float(jnp.mean((o1 == o2).astype(jnp.float32)))
        print(f"any agree: {agree:.5f} occl rate {float(o2.mean()):.3f}", flush=True)
        t_old = timed(old_any, lambda x=None: float(old_any().sum()))
        t_new = timed(new_any, lambda x=None: float(new_any().sum()))
        print(f"any shadow: old {t_old*1e3:.1f} ms  new {t_new*1e3:.1f} ms", flush=True)

    # ---- incoherent bounce-like rays (random dirs from hit points) ----
    rng = np.random.default_rng(0)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)
    btmax = jnp.where(h_new["tri"] >= 0, jnp.inf, 0.0)
    old_b = lambda: trace_closest_full(
        packed40, wc_min, wc_max, origin, rd, 0.0, btmax
    )
    new_b = lambda: trace_bvh.trace_closest_bvh_full(
        packed40, bounds, meta, origin, rd, 0.0, btmax
    )
    if "bounce" in phases:
        b1, b2 = old_b(), new_b()
        agree = float(jnp.mean((b1["tri"] == b2["tri"]).astype(jnp.float32)))
        print(f"bounce agree tri: {agree:.5f}", flush=True)
        t_old = timed(old_b, lambda x=None: float(old_b()["t"].min()))
        t_new = timed(new_b, lambda x=None: float(new_b()["t"].min()))
        print(f"closest_full incoherent: old {t_old*1e3:.1f} ms  new {t_new*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
