#!/usr/bin/env python
"""Stage-level PT timing on the real device: frame total, ray count,
primary-trace-only, and per-mode jit variants. Prints one line per stage.

Usage: python scripts/bench_pt_stages.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080


def timeit(fn, force, n=5, warmup=2):
    for _ in range(warmup):
        force(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        force(fn())
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()

    from prosper_tpu.ops import trace
    from prosper_tpu.ops.rays import pinhole_rays
    from prosper_tpu.ops.texture import pack_material_tables
    from prosper_tpu.render.pt import pt_render_sample
    from prosper_tpu.scene.textures import build_texture_arena
    from prosper_tpu.scene.world import World

    world = World(SCENE)
    arena = build_texture_arena(world.doc, max_dim=2048)
    static = {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in world.static_scene_arrays().items()
    }
    arena_dev = {k: jnp.asarray(v) for k, v in arena.uniforms().items()}
    arena_dev["mat_f32"], arena_dev["mat_i32"] = pack_material_tables(
        world.static_scene_arrays()["materials"], arena_dev
    )
    frame = world.frame_arrays(0.0)
    fd = {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in frame.items()
        if k not in ("scene_camera", "bvh_depth")
    }
    cam = {
        k: jnp.asarray(v)
        for k, v in world.make_camera((WIDTH, HEIGHT)).uniforms().items()
    }
    fd["geom"] = trace.GeometryCache().get(
        static, frame["transforms"], frame["normal_transforms"]
    )

    # full frame + ray count
    def frame_fn():
        color, n_rays = pt_render_sample(
            static, fd, arena_dev, cam, WIDTH, HEIGHT, 0,
            max_bounces=3, return_stats=True,
        )
        return color, n_rays

    color, n_rays = frame_fn()
    n_rays = int(n_rays)
    ms = timeit(frame_fn, lambda x: jax.block_until_ready(x[0]))
    print(f"frame_total: {ms:.1f} ms  n_rays={n_rays/1e6:.3f}M  "
          f"-> {n_rays/ms/1e3:.2f} Mrays/s")

    # primary trace alone (full kernel, packed attrs)
    from prosper_tpu.ops.trace_bvh import trace_closest_bvh_full
    from prosper_tpu.ops.trace_pallas_full import pack_tris_full

    px_np, py_np, _ = trace.block_pixel_order(WIDTH, HEIGHT)
    px, py = jnp.asarray(px_np), jnp.asarray(py_np)
    uv = (jnp.stack([px, py], -1).astype(jnp.float32) + 0.5) / jnp.array(
        [WIDTH, HEIGHT], jnp.float32
    )
    ray_o, ray_d = pinhole_rays(cam, uv)
    bvh = trace.frame_bvh(fd)
    packed_full = pack_tris_full(static, fd)

    tr = jax.jit(
        lambda o, d: trace_closest_bvh_full(
            packed_full, bvh[0], bvh[1], o, d, 0.0, jnp.inf
        )["t"]
    )
    ms_p = timeit(lambda: tr(ray_o, ray_d), jax.block_until_ready)
    R = ray_o.shape[0]
    print(f"primary_trace: {ms_p:.1f} ms  ({R/1e6:.2f}M rays, "
          f"{R/ms_p/1e3:.1f} Mrays/s)")

    # live bounce set: reproduce chunk live rays (hit pixels)
    hit = jax.jit(
        lambda o, d: trace_closest_bvh_full(
            packed_full, bvh[0], bvh[1], o, d, 0.0, jnp.inf
        )
    )(ray_o, ray_d)
    import numpy as np

    tri = np.asarray(hit["t"] < np.inf)
    live = int(tri.sum())
    print(f"primary hits: {live} ({live/R*100:.1f}% coverage)")


if __name__ == "__main__":
    main()
