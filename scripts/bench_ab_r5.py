#!/usr/bin/env python
"""Round-5 frame-level A/Bs on the live chip, one serial session:

  1. ReSTIR 1024-light frame: restir_shadow_tile 256 vs 128
  2. PT 3-bounce frame: bounce_tap_mip 0 (base-mip parity) vs 4
  3. PT shadow any-hit descent: any_tracer stack vs dense

Prints one line per configuration (median of 5 frames, two in flight).
jax.clear_caches() between configurations (config values are baked at
trace time).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080
MAX_BOUNCES = 3


def main():
    import jax

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from prosper_tpu import config
    from prosper_tpu.ops import trace as _trace
    from prosper_tpu.ops.texture import pack_material_tables
    from prosper_tpu.ops.tonemap import load_tony_mc_mapface
    from prosper_tpu.render.frame import render_modes
    from prosper_tpu.render.pt import pt_render_sample
    from prosper_tpu.scene.textures import build_texture_arena
    from prosper_tpu.scene.world import World

    world = World(SCENE)
    rng = np.random.default_rng(0)
    lo = world.wc_aabb_min_obj.min(axis=0)
    hi = world.wc_aabb_max_obj.max(axis=0)
    world.lights.point_position[:1024] = rng.uniform(lo, hi, (1024, 3))
    world.lights.point_radiance[:1024] = rng.uniform(0.05, 0.5, (1024, 3))
    world.lights.point_radius[:1024] = float(np.linalg.norm(hi - lo))
    world.lights.point_count = 1024

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
    frame_dev = {
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
    frame_dev["geom"] = _trace.GeometryCache().get(
        static, frame["transforms"], frame["normal_transforms"]
    )
    lut = jnp.asarray(load_tony_mc_mapface())

    def timeit(run, frames=5, warmup=2):
        for i in range(warmup):
            float(run(i))
        marks = [time.perf_counter()]
        prev = None
        for i in range(frames):
            m = run(warmup + i)
            if prev is not None:
                float(prev)
                marks.append(time.perf_counter())
            prev = m
        float(prev)
        marks.append(time.perf_counter())
        iv = sorted(marks[k + 1] - marks[k] for k in range(frames))
        return iv[frames // 2] * 1e3

    # ---- 1. restir shadow tile
    render = render_modes()["restir"]
    for tile in (256, 128):
        config.policy.restir_shadow_tile = tile
        jax.clear_caches()
        state = None

        def run(i):
            nonlocal state
            img, state = render(
                static=static, frame=frame_dev, arena=arena_dev, cam=cam,
                lut=lut, width=WIDTH, height=HEIGHT, frame_index=i,
                state=state, max_bounces=MAX_BOUNCES,
            )
            return img.mean()

        ms = timeit(run)
        print(f"restir shadow_tile={tile}: {ms:.1f} ms/frame", flush=True)
    config.policy.restir_shadow_tile = 256

    # ---- 2. PT bounce tap mip + 3. any-tracer
    for mip, anyt in ((0, "stack"), (4, "stack"), (4, "dense")):
        config.policy.bounce_tap_mip = mip
        config.policy.any_tracer = anyt
        jax.clear_caches()

        def run_pt(i):
            color, _n = pt_render_sample(
                static, frame_dev, arena_dev, cam, WIDTH, HEIGHT, i,
                max_bounces=MAX_BOUNCES, return_stats=True,
            )
            return color.mean()

        ms = timeit(run_pt)
        rays = int(
            pt_render_sample(
                static, frame_dev, arena_dev, cam, WIDTH, HEIGHT, 0,
                max_bounces=MAX_BOUNCES, return_stats=True,
            )[1]
        )
        print(
            f"pt bounce_tap_mip={mip} any_tracer={anyt}: {ms:.1f} ms/frame "
            f"({rays / ms / 1e3:.2f} Mrays/s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
