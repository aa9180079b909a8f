#!/usr/bin/env python
"""Op-level device profile of the full bench.py PT frame (xplane)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xprof import dump_trace, top_ops  # noqa: E402

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080


def main():
    import jax

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

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
    from prosper_tpu.ops import trace as _trace

    frame_dev["geom"] = _trace.GeometryCache().get(
        static, frame["transforms"], frame["normal_transforms"]
    )

    def fn():
        color, n_rays = pt_render_sample(
            static,
            frame_dev,
            arena_dev,
            cam,
            WIDTH,
            HEIGHT,
            0,
            max_bounces=3,
            return_stats=True,
        )
        return color

    force = lambda x: jax.block_until_ready(x)
    outdir = dump_trace(fn, force)
    top_ops(outdir, n=40)


if __name__ == "__main__":
    main()
