#!/usr/bin/env python
"""Op-level device profile of a full render-mode frame (xplane).

Usage: python scripts/xprof_mode.py [restir|deferred|pt]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xprof import dump_trace, top_ops  # noqa: E402

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080
N_LIGHTS = 1024


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "restir"
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
    render = render_modes()[mode]

    holder = {"state": None}

    def fn():
        img, st = render(
            static=static, frame=fd, arena=arena_dev, cam=cam, lut=lut,
            width=WIDTH, height=HEIGHT, frame_index=2, state=holder["state"],
            max_bounces=3,
        )
        holder["state"] = st
        return img

    outdir = dump_trace(fn, lambda x: float(x.mean()))
    top_ops(outdir, n=30)


if __name__ == "__main__":
    main()
