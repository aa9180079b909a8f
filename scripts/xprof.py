#!/usr/bin/env python
"""Op-level device profile of one BVH trace call (jax.profiler xplane).

Usage: python scripts/xprof.py [frac]   (frac: use R//frac rays)
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080


def dump_trace(fn, force, outdir="/tmp/xprof"):
    import jax

    fn()
    force(fn())
    import shutil

    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        for _ in range(2):
            force(fn())
    return outdir


def top_ops(outdir, n=25):
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {outdir}"
    data = ProfileData.from_file(paths[0])
    totals = defaultdict(float)
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "xla modules" in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                totals[ev.name[:90]] += dur
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:n]:
        print(f"{ms/2:9.2f} ms  {name}")


def self_times(outdir, n=30, frames=2):
    """Per-op SELF time (children subtracted) from the 'XLA Ops' line —
    the nested while/cond/fusion events on that line otherwise double
    count everything they contain. Prints per-FRAME ms (divides by
    `frames`, the dump_trace loop count)."""
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {outdir}"
    data = ProfileData.from_file(paths[0])
    for plane in data.planes:
        if not plane.name.endswith("TPU:0"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = sorted(
                ((ev.start_ns, ev.end_ns, ev.name) for ev in line.events),
                key=lambda t: (t[0], -t[1]),
            )
            self_ms = defaultdict(float)
            count = defaultdict(int)
            stack = []  # (end_ns, name, child_ns accumulator index)
            child = []
            for s, e, name in evs:
                while stack and s >= stack[-1][0]:
                    end, nm, ci = stack.pop()
                    dur = child[ci][0]
                    self_ms[nm] += (dur - child[ci][1]) / 1e6
                    count[nm] += 1
                    if stack:
                        child[stack[-1][2]][1] += dur
                child.append([e - s, 0.0])
                stack.append((e, name, len(child) - 1))
            while stack:
                end, nm, ci = stack.pop()
                self_ms[nm] += (child[ci][0] - child[ci][1]) / 1e6
                count[nm] += 1
                if stack:
                    child[stack[-1][2]][1] += child[ci][0]
            total = sum(self_ms.values())
            print(f"-- self-time total {total/frames:.1f} ms/frame --")
            for name, ms in sorted(self_ms.items(), key=lambda kv: -kv[1])[:n]:
                print(
                    f"{ms/frames:9.2f} ms  x{count[name]:<4d} {name[:84]}"
                )


def main():
    import jax
    import jax.numpy as jnp

    from prosper_tpu.accel.bvh import build_bvh, pack_nodes
    from prosper_tpu.ops import trace, trace_bvh, trace_pallas
    from prosper_tpu.ops.rays import pinhole_rays
    from prosper_tpu.scene.world import World

    frac = int(sys.argv[1]) if len(sys.argv) > 1 else 1

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
    bounds, meta = jnp.asarray(bounds_np), jnp.asarray(meta_np)

    cam_obj = world.make_camera((WIDTH, HEIGHT))
    cam = {k: jnp.asarray(v) for k, v in cam_obj.uniforms().items()}
    px_np, py_np, _ = trace.block_pixel_order(WIDTH, HEIGHT)
    uv = (
        jnp.stack([jnp.asarray(px_np), jnp.asarray(py_np)], -1).astype(jnp.float32)
        + 0.5
    ) / jnp.array([WIDTH, HEIGHT], jnp.float32)
    ray_o, ray_d = pinhole_rays(cam, uv)
    n = (ray_o.shape[0] // frac) // 2048 * 2048
    ray_o = jax.block_until_ready(ray_o[:n])
    ray_d = ray_d[:n]
    print(f"rays: {n/1e6:.2f}M")

    tris = trace.world_triangles(static, frame_dev)
    packed9 = jax.block_until_ready(trace_pallas.pack_tris(tris))

    from prosper_tpu.ops.trace_pallas_full import pack_tris_full, trace_closest_full

    packed40 = jax.block_until_ready(pack_tris_full(static, frame_dev))
    wc_min = frame_dev["wc_aabb_min_w"]
    wc_max = frame_dev["wc_aabb_max_w"]

    variants = {
        "bvh_closest": lambda: trace_bvh.trace_closest_bvh(
            packed9, bounds, meta, ray_o, ray_d, 0.0, jnp.inf
        ),
        "bvh_closest_full": lambda: trace_bvh.trace_closest_bvh_full(
            packed40, bounds, meta, ray_o, ray_d, 0.0, jnp.inf
        ),
        "old_closest_full": lambda: trace_closest_full(
            packed40, wc_min, wc_max, ray_o, ray_d, 0.0, jnp.inf
        ),
        "bvh_any": lambda: trace_bvh.trace_any_bvh(
            packed9, bounds, meta, ray_o, ray_d, 0.0, 8.0
        ),
    }
    for name, fn in variants.items():
        force = (lambda x: float(x.sum())) if name.endswith("any") else (
            lambda x: float(x["t"].min())
        )
        outdir = dump_trace(fn, force, outdir=f"/tmp/xprof_{name}")
        print(f"==== {name} ====")
        top_ops(outdir, n=6)




def profile_mode(mode="pt", n_lights=1024):
    """Frame-level op profile of a full render mode."""
    import jax
    import jax.numpy as jnp

    from prosper_tpu.render.frame import render_modes
    from prosper_tpu.render.pt import pt_render_sample
    from prosper_tpu.scene.textures import build_texture_arena
    from prosper_tpu.scene.world import World
    from prosper_tpu.ops.texture import pack_material_tables

    world = World(SCENE)
    if mode != "pt":
        rng = np.random.default_rng(0)
        lo = world.wc_aabb_min_obj.min(axis=0)
        hi = world.wc_aabb_max_obj.max(axis=0)
        world.lights.point_position[:n_lights] = rng.uniform(lo, hi, (n_lights, 3))
        world.lights.point_radiance[:n_lights] = rng.uniform(0.05, 0.5, (n_lights, 3))
        world.lights.point_radius[:n_lights] = float(np.linalg.norm(hi - lo))
        world.lights.point_count = n_lights
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
    from prosper_tpu.ops.tonemap import load_tony_mc_mapface

    lut = jnp.asarray(load_tony_mc_mapface())
    if mode == "pt":
        fn = lambda: pt_render_sample(
            static, fd, arena_dev, cam, WIDTH, HEIGHT, 1, max_bounces=3
        )
        force = lambda x: float(x.mean())
    else:
        render = render_modes()[mode]

        def fn():
            img, _ = render(
                static=static, frame=fd, arena=arena_dev, cam=cam, lut=lut,
                width=WIDTH, height=HEIGHT, frame_index=1, state=None,
            )
            return img
        force = lambda x: float(x.mean())
    outdir = dump_trace(fn, force, outdir=f"/tmp/xprof_{mode}")
    top_ops(outdir, n=20)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] in ("pt", "deferred", "restir", "forward"):
        profile_mode(sys.argv[1])
    else:
        main()
