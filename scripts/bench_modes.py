#!/usr/bin/env python
"""Frame-time bench for every render mode at 1080p on the TPU
(VERDICT round-1 targets: deferred 1024-light < 500 ms, ReSTIR < 400 ms,
PT 3-bounce < ~400 ms). Wall time per frame, warm, single jit call per
frame so the ~30 ms host dispatch overhead is included once like a real
frame loop would pay it.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080
N_LIGHTS = 1024


def main():
    modes = sys.argv[1:] or ["pt", "deferred", "restir"]
    import jax

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from prosper_tpu.ops.texture import pack_material_tables
    from prosper_tpu.ops.tonemap import load_tony_mc_mapface
    from prosper_tpu.render.frame import render_modes
    from prosper_tpu.scene.textures import build_texture_arena
    from prosper_tpu.scene.world import World

    world = World(SCENE)
    rng = np.random.default_rng(0)
    lo = world.wc_aabb_min_obj.min(axis=0)
    hi = world.wc_aabb_max_obj.max(axis=0)
    world.lights.point_position[:N_LIGHTS] = rng.uniform(lo, hi, (N_LIGHTS, 3))
    world.lights.point_radiance[:N_LIGHTS] = rng.uniform(
        0.05, 0.5, (N_LIGHTS, 3)
    )
    world.lights.point_radius[:N_LIGHTS] = float(np.linalg.norm(hi - lo))
    world.lights.point_count = N_LIGHTS

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
    lut = jnp.asarray(load_tony_mc_mapface())
    fns = render_modes()

    for mode in modes:
        state = None
        render = fns[mode]

        def run(i, state):
            img, state = render(
                static=static, frame=fd, arena=arena_dev, cam=cam, lut=lut,
                width=WIDTH, height=HEIGHT, frame_index=i, state=state,
                max_bounces=3,
            )
            return img, state

        img, state = run(0, state)
        float(img.mean())
        img, state = run(1, state)
        float(img.mean())
        t0 = time.perf_counter()
        n = 3
        for i in range(n):
            img, state = run(2 + i, state)
            float(img.mean())
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{mode:10s} {ms:8.1f} ms/frame (1080p, {N_LIGHTS} lights)",
              flush=True)


if __name__ == "__main__":
    main()
