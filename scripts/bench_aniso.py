#!/usr/bin/env python
"""Deferred 1080p frame timing at aniso_taps 1 vs 4 (the round-5
measurement behind keeping anisotropic filtering opt-in: software
aniso multiplies latency-bound arena gathers; +67% frame time)."""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    from prosper_tpu.scene.caches import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from prosper_tpu.ops import trace as _trace
    from prosper_tpu.ops.texture import pack_material_tables
    from prosper_tpu.ops.tonemap import load_tony_mc_mapface
    from prosper_tpu.render.frame import render_modes
    from prosper_tpu.scene.textures import build_texture_arena
    from prosper_tpu.scene.world import World

    SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
    W, H = 1920, 1080
    world = World(SCENE)
    rng = np.random.default_rng(0)
    lo = world.wc_aabb_min_obj.min(axis=0); hi = world.wc_aabb_max_obj.max(axis=0)
    world.lights.point_position[:1024] = rng.uniform(lo, hi, (1024, 3))
    world.lights.point_radiance[:1024] = rng.uniform(0.05, 0.5, (1024, 3))
    world.lights.point_radius[:1024] = float(np.linalg.norm(hi - lo))
    world.lights.point_count = 1024
    arena = build_texture_arena(world.doc, max_dim=2048)
    static = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()} if isinstance(v, dict) else jnp.asarray(v))
              for k, v in world.static_scene_arrays().items()}
    arena_dev = {k: jnp.asarray(v) for k, v in arena.uniforms().items()}
    arena_dev["mat_f32"], arena_dev["mat_i32"] = pack_material_tables(
        world.static_scene_arrays()["materials"], arena_dev)
    frame = world.frame_arrays(0.0)
    frame_dev = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()} if isinstance(v, dict) else jnp.asarray(v))
                 for k, v in frame.items() if k not in ("scene_camera", "bvh_depth")}
    cam = {k: jnp.asarray(v) for k, v in world.make_camera((W, H)).uniforms().items()}
    frame_dev["geom"] = _trace.GeometryCache().get(static, frame["transforms"], frame["normal_transforms"])
    lut = jnp.asarray(load_tony_mc_mapface())
    render = render_modes()["deferred"]

    for taps in (1, 4):
        state = None
        def run(i):
            nonlocal state
            img, state = render(static=static, frame=frame_dev, arena=arena_dev, cam=cam,
                                lut=lut, width=W, height=H, frame_index=i, state=state,
                                max_bounces=3, aniso_taps=taps)
            return img.mean()
        for i in range(2):
            float(run(i))
        marks = [time.perf_counter()]; prev = None
        for i in range(6):
            m = run(2 + i)
            if prev is not None:
                float(prev); marks.append(time.perf_counter())
            prev = m
        float(prev); marks.append(time.perf_counter())
        iv = sorted(marks[k+1] - marks[k] for k in range(6))
        print(f"deferred aniso_taps={taps}: {iv[3]*1e3:.1f} ms/frame", flush=True)

main()
