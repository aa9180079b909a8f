#!/usr/bin/env python
"""Host dispatch cost of the PT frame: time N non-blocking dispatches
(queue depth unlimited) vs blocked per-frame wall time. If dispatch-only
time per frame is large, the host arg-processing path is a bottleneck
that frame pipelining cannot hide.

Usage: python scripts/bench_dispatch.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080


def main():
    import jax
    import jax.numpy as jnp

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()

    from prosper_tpu.ops import trace
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

    def frame_fn(i):
        # return_stats=True matches bench.py's variant (compile-cache hit)
        color, _ = pt_render_sample(
            static, fd, arena_dev, cam, WIDTH, HEIGHT, i, max_bounces=3,
            return_stats=True,
        )
        return color

    # warmup / compile
    jax.block_until_ready(frame_fn(0))
    jax.block_until_ready(frame_fn(1))

    # dispatch-only: N calls, block once at the end
    N = 10
    t0 = time.perf_counter()
    outs = [frame_fn(i) for i in range(N)]
    t_disp = (time.perf_counter() - t0) / N * 1e3
    jax.block_until_ready(outs)
    t_total = (time.perf_counter() - t0) / N * 1e3
    print(f"dispatch-only: {t_disp:.1f} ms/frame (host arg processing)")
    print(f"pipelined total: {t_total:.1f} ms/frame (device-bound if > dispatch)")

    # blocked per frame
    t0 = time.perf_counter()
    for i in range(N):
        jax.block_until_ready(frame_fn(i))
    t_block = (time.perf_counter() - t0) / N * 1e3
    print(f"blocked: {t_block:.1f} ms/frame")


if __name__ == "__main__":
    main()
