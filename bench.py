#!/usr/bin/env python
"""Headline benchmark: path-traced FlightHelmet frame throughput.

Prints ONE JSON line:
  {"metric": "pt_mrays_per_s", "value": N, "unit": "Mrays/s",
   "vs_baseline": N}

Baseline derivation (BASELINE.md): the north-star target is a path-traced
frame at 1080p >= 30 FPS on one TPU v5e chip. At 1080p with 3 bounces
(closest + shadow rays, ~steady-state active-ray mix measured from the
instrumented tracer) 30 FPS corresponds to ~BASELINE_MRAYS Mrays/s, so
vs_baseline = measured / BASELINE_MRAYS; >= 1.0 means the target is met.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080
MAX_BOUNCES = 3
WARMUP_FRAMES = 2
BENCH_FRAMES = 8

# 30 FPS x (rays actually traced per 1080p frame at 3 bounces for this
# scene: ~2.3M — primary 2.07M + the shadow/bounce mix of the 6%-coverage
# helmet, measured by the same instrumented kernel). The north star
# (>=30 FPS at 1080p) therefore corresponds to ~69 Mrays/s here;
# vs_baseline >= 1.0 means the target FPS is met.
BASELINE_MRAYS = 69.0


def main() -> int:
    import jax

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

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
    from prosper_tpu.ops.texture import pack_material_tables

    arena_dev["mat_f32"], arena_dev["mat_i32"] = pack_material_tables(
        world.static_scene_arrays()["materials"], arena_dev
    )
    frame = world.frame_arrays(0.0)
    frame_dev = {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in frame.items()
        if k not in ("scene_camera", "bvh_depth")
    }
    cam_obj = world.make_camera((WIDTH, HEIGHT))
    cam = {k: jnp.asarray(v) for k, v in cam_obj.uniforms().items()}

    def run(i):
        color, n_rays = pt_render_sample(
            static,
            frame_dev,
            arena_dev,
            cam,
            WIDTH,
            HEIGHT,
            i,
            max_bounces=MAX_BOUNCES,
            return_stats=True,
        )
        return color, n_rays

    # warmup/compile
    for i in range(WARMUP_FRAMES):
        color, n_rays = run(i)
        float(color.mean())  # force (block_until_ready can return early
        # on this backend for pure-XLA tails)

    # median per-frame throughput: the tunneled backend occasionally
    # hiccups for hundreds of ms, which would poison a mean over a short
    # run; the median is a robust estimate of steady-state frame rate
    rates = []
    for i in range(BENCH_FRAMES):
        t0 = time.perf_counter()
        color, n_rays = run(WARMUP_FRAMES + i)
        float(color.mean())
        dt = time.perf_counter() - t0
        rates.append(int(n_rays) / dt)

    rates.sort()
    mid = len(rates) // 2
    mrays = (rates[mid - 1] + rates[mid]) / 2.0 / 1e6
    print(
        json.dumps(
            {
                "metric": "pt_mrays_per_s",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
