#!/usr/bin/env python
"""Sponza-class scale evidence: PT + deferred at 1080p on an instanced
helmet grid (World(instance_grid=N): N*N replicas through the normal
node/TLAS pipeline — ~12k clusters / 1.5M tris at N=4).

The camera is raised to frame the WHOLE grid (high coverage — the
primary tile mask's worst case), unlike the 6%-coverage single-helmet
headline scene. Prints per-stage lines plus tile-mask live fraction.

Usage: python scripts/bench_grid.py [N]   (default 4)
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import jax

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from prosper_tpu.ops import trace as _trace
    from prosper_tpu.ops.texture import pack_material_tables
    from prosper_tpu.ops.tonemap import load_tony_mc_mapface
    from prosper_tpu.render.frame import render_modes
    from prosper_tpu.render.pt import pt_render_sample
    from prosper_tpu.scene.camera import CameraTransform
    from prosper_tpu.scene.textures import build_texture_arena
    from prosper_tpu.scene.world import World

    world = World(SCENE, instance_grid=n)
    frame = world.frame_arrays(0.0)
    print(
        f"grid {n}x{n}: clusters={world.n_world_clusters} "
        f"tris={world.n_real_tris} bvh_depth={frame['bvh_depth']}",
        flush=True,
    )

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
    frame_dev = {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in frame.items()
        if k not in ("scene_camera", "bvh_depth")
    }
    frame_dev["geom"] = _trace.GeometryCache().get(
        static, frame["transforms"], frame["normal_transforms"]
    )

    # elevated camera framing the whole grid (high primary coverage)
    lo = np.asarray(frame["wc_aabb_min_w"]).min(0)
    hi = np.asarray(frame["wc_aabb_max_w"]).max(0)
    c = (lo + hi) / 2
    ext = float(np.linalg.norm(hi - lo))
    cam_obj = world.make_camera((WIDTH, HEIGHT))
    cam_obj.look_at(
        CameraTransform(
            eye=(c + np.array([0.0, 0.45 * ext, 0.55 * ext])).astype(np.float32),
            target=c.astype(np.float32),
            up=np.array([0, 1, 0], np.float32),
        )
    )
    cam = {k: jnp.asarray(v) for k, v in cam_obj.uniforms().items()}

    # tile-mask coverage at this view
    from prosper_tpu.ops.trace_bvh import primary_cam_vec, primary_tile_mask
    from prosper_tpu.render.pt import _packed_pixels

    _c, _r, tpb, _r0 = _packed_pixels(WIDTH, HEIGHT)
    cv = primary_cam_vec(cam, WIDTH, HEIGHT)
    tmask = primary_tile_mask(cv, jnp.asarray(tpb),
                              frame_dev["wc_aabb_min_w"],
                              frame_dev["wc_aabb_max_w"])
    print(f"primary tile mask live fraction: "
          f"{float(jnp.mean(tmask.astype(jnp.float32))):.3f}", flush=True)

    def timeit(run, frames=5, warmup=2):
        """run(i) -> un-forced scalar array; two frames in flight,
        median inter-completion interval (bench.py convention)."""
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

    # --- PT
    def run_pt(i):
        color, _n = pt_render_sample(
            static, frame_dev, arena_dev, cam, WIDTH, HEIGHT, i,
            max_bounces=MAX_BOUNCES, return_stats=True,
        )
        return color.mean()

    rays = int(
        pt_render_sample(
            static, frame_dev, arena_dev, cam, WIDTH, HEIGHT, 0,
            max_bounces=MAX_BOUNCES, return_stats=True,
        )[1]
    )
    ms = timeit(run_pt)
    print(f"pt: {ms:.1f} ms/frame  rays/frame={rays}  "
          f"{rays / ms / 1e3:.2f} Mrays/s", flush=True)

    # --- deferred, 1024 lights
    rng = np.random.default_rng(0)
    world.lights.point_position[:1024] = rng.uniform(lo, hi, (1024, 3))
    world.lights.point_radiance[:1024] = rng.uniform(0.05, 0.5, (1024, 3))
    world.lights.point_radius[:1024] = ext
    world.lights.point_count = 1024
    static_l = {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in world.static_scene_arrays().items()
    }
    lut = jnp.asarray(load_tony_mc_mapface())
    render = render_modes()["deferred"]
    state = {}

    def run_def(i):
        nonlocal state
        img, state = render(
            static=static_l, frame=frame_dev, arena=arena_dev, cam=cam,
            lut=lut, width=WIDTH, height=HEIGHT, frame_index=i,
            state=state or None, max_bounces=MAX_BOUNCES,
        )
        return img.mean()

    ms_d = timeit(run_def)
    print(f"deferred(1024 lights): {ms_d:.1f} ms/frame", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
