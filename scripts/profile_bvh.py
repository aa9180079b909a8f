#!/usr/bin/env python
"""Profile the BVH trace kernel: where do the milliseconds go?

Times (a) the XLA prep (ray layout building) alone, (b) the full traced
call, (c) scaling with tile count, to separate per-tile fixed costs from
traversal work. Serial TPU use.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080


def main():
    import jax
    import jax.numpy as jnp

    from prosper_tpu.accel.bvh import build_bvh, pack_nodes
    from prosper_tpu.ops import trace, trace_bvh, trace_pallas
    from prosper_tpu.ops.rays import pinhole_rays
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
    bvh = build_bvh(frame["wc_aabb_min_w"], frame["wc_aabb_max_w"], max_leaf_size=1)
    bounds_np, meta_np = pack_nodes(bvh)
    bounds = jnp.asarray(bounds_np)
    meta = jnp.asarray(meta_np)

    cam_obj = world.make_camera((WIDTH, HEIGHT))
    cam = {k: jnp.asarray(v) for k, v in cam_obj.uniforms().items()}
    px_np, py_np, _ = trace.block_pixel_order(WIDTH, HEIGHT)
    uv = (
        jnp.stack([jnp.asarray(px_np), jnp.asarray(py_np)], -1).astype(jnp.float32)
        + 0.5
    ) / jnp.array([WIDTH, HEIGHT], jnp.float32)
    ray_o, ray_d = pinhole_rays(cam, uv)
    ray_o, ray_d = jax.block_until_ready((ray_o, ray_d))

    tris = trace.world_triangles(static, frame_dev)
    packed9 = jax.block_until_ready(trace_pallas.pack_tris(tris))

    prep = jax.jit(lambda o, d: trace_bvh._prep_bvh(o, d, jnp.inf))

    def t_of(f, force, n=5):
        f()
        force(f())
        t0 = time.perf_counter()
        for _ in range(n):
            force(f())
        return (time.perf_counter() - t0) / n * 1e3

    t_prep = t_of(
        lambda: prep(ray_o, ray_d), lambda x: float(x[-1].min()) if x else None
    )
    print(f"prep alone: {t_prep:.1f} ms", flush=True)

    full = lambda: trace_bvh.trace_closest_bvh(
        packed9, bounds, meta, ray_o, ray_d, 0.0, jnp.inf
    )
    t_full = t_of(full, lambda x: float(x["t"].min()))
    print(f"closest_bvh 2.07M rays: {t_full:.1f} ms", flush=True)

    # scaling in tile count (prefix slices keep packet structure)
    R = ray_o.shape[0]
    for frac in (2, 4, 8):
        n = (R // frac) // 256 * 256
        sub = lambda n=n: trace_bvh.trace_closest_bvh(
            packed9, bounds, meta, ray_o[:n], ray_d[:n], 0.0, jnp.inf
        )
        t_sub = t_of(sub, lambda x: float(x["t"].min()))
        print(f"closest_bvh {n/1e6:.2f}M rays: {t_sub:.1f} ms", flush=True)

    # all-dead rays: pure per-tile overhead
    dead = lambda: trace_bvh.trace_closest_bvh(
        packed9, bounds, meta, ray_o, ray_d, 0.0, 0.0
    )
    t_dead = t_of(dead, lambda x: float(x["t"].min()))
    n_tiles = R // 256
    print(
        f"closest_bvh all-dead: {t_dead:.1f} ms ({t_dead*1e3/n_tiles:.2f} us/tile)",
        flush=True,
    )


if __name__ == "__main__":
    main()
