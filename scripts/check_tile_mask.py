#!/usr/bin/env python
"""Parity + timing of the primary tile mask: trace_primary_bvh_full
with tile_mask vs without, 1080p FlightHelmet (device)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

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

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from prosper_tpu.ops import trace, trace_bvh
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
    bounds, meta = fd["bvh_bounds"], fd["bvh_meta"]
    packed40 = jax.block_until_ready(pack_tris_full(static, fd))
    cam = {
        k: jnp.asarray(v)
        for k, v in world.make_camera((WIDTH, HEIGHT)).uniforms().items()
    }

    px_np, py_np, _ = trace.block_pixel_order(WIDTH, HEIGHT)
    cols_np, rows_np, R0 = trace_bvh.pack_pixels_np(px_np, py_np)
    tpb = jnp.asarray(trace_bvh.tile_px_bounds_np(px_np, py_np))
    cols, rows = jnp.asarray(cols_np), jnp.asarray(rows_np)
    cam_vec = trace_bvh.primary_cam_vec(cam, WIDTH, HEIGHT)
    i_vec = jnp.zeros((1, 4), jnp.int32)

    mask = trace_bvh.primary_tile_mask(
        cam_vec, tpb, fd["wc_aabb_min_w"], fd["wc_aabb_max_w"]
    )
    live = int(np.asarray(mask).sum())
    print(f"live tiles: {live}/{mask.shape[0]} "
          f"({live / mask.shape[0] * 100:.1f}%)")

    base = jax.jit(
        lambda: trace_bvh.trace_primary_bvh_full(
            packed40, bounds, meta, cols, rows, cam_vec, i_vec
        )
    )
    masked = jax.jit(
        lambda: trace_bvh.trace_primary_bvh_full(
            packed40, bounds, meta, cols, rows, cam_vec, i_vec,
            tile_mask=trace_bvh.primary_tile_mask(
                cam_vec, tpb, fd["wc_aabb_min_w"], fd["wc_aabb_max_w"]
            ),
        )
    )
    a = np.asarray(base())[:R0]
    b = np.asarray(masked())[:R0]
    mism = int((a[:, 1] != b[:, 1]).sum())
    af = np.where(np.isinf(a), 3e38, a)
    bf = np.where(np.isinf(b), 3e38, b)
    print(f"tri mismatches: {mism}; max|row diff| {np.abs(af - bf).max():.3e}")
    ms_b = timeit(base, jax.block_until_ready)
    ms_m = timeit(masked, jax.block_until_ready)
    print(f"primary unmasked {ms_b:.2f} ms -> masked {ms_m:.2f} ms "
          f"(incl. mask prepass)")
    sys.exit(0 if mism == 0 else 1)


if __name__ == "__main__":
    main()
