#!/usr/bin/env python
"""Headline benchmark: all three BASELINE metrics at 1080p.

Prints cumulative JSON snapshot lines, one after each completed stage,
so the LAST line on stdout is always the best-available result — even
if a later stage crashes or the process is killed mid-run:

  {"metric": "pt_mrays_per_s", "value": N, "unit": "Mrays/s",
   "vs_baseline": N, "deferred_ms": N, "restir_ms": N,
   "kernel_smoke_ok": true, "backend": "tpu", "errors": {...}}

The primary metric stays the PT Mrays/s line (driver compatibility);
`deferred_ms` / `restir_ms` are the 1024-light clustered-deferred and
ReSTIR DI frame times from the same scene (BASELINE.json metric string:
"Mrays/s path-trace + ms/frame deferred ReSTIR at 1080p").

Failure policy (VERDICT r3 weak #1): every stage is bounded by a
WATCHDOG THREAD (not signal.alarm — a SIGALRM handler only runs
between Python bytecodes, so it cannot interrupt a device call wedged
inside the runtime, which is precisely the observed tunnel failure
mode: backend init succeeds, then the first execute blocks forever in
a futex wait). On expiry the watchdog records the stage error, prints
the cumulative JSON snapshot, and hard-exits — the last stdout line
still parses and carries every stage that did finish. The reference's
analog of this recover-don't-crash posture is the swapchain
out-of-date recreate loop (/root/reference/src/App.cpp:642-670).

Baseline derivation (BASELINE.md): the north-star target is a
path-traced frame at 1080p >= 30 FPS on one TPU v5e chip. At 1080p with
3 bounces (closest + shadow rays, ~steady-state active-ray mix measured
from the instrumented tracer) 30 FPS corresponds to ~BASELINE_MRAYS
Mrays/s, so vs_baseline = measured / BASELINE_MRAYS; >= 1.0 means the
target is met.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import traceback

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
# vs_baseline >= 1.0 means the target FPS is met. RAY_COUNT_SANITY below
# asserts the derivation against the live instrumented count so a scene
# or bounce change cannot silently redefine the target (VERDICT weak #8).
BASELINE_MRAYS = 69.0
RAY_COUNT_SANITY = (1.8e6, 3.2e6)  # plausible rays/frame band at 1080p x3

RESULT = {
    "metric": "pt_mrays_per_s",
    "value": None,
    "unit": "Mrays/s",
    "vs_baseline": None,
    "deferred_ms": None,
    "restir_ms": None,
    "kernel_smoke_ok": None,
    "backend": None,
    "errors": {},
}


def snapshot():
    print(json.dumps(RESULT), flush=True)


def _watchdog_fire(name, timeout_s):
    # Runs on a timer thread while the main thread is wedged inside a
    # runtime call that will never return. Record, emit, hard-exit:
    # rc=0 so the driver parses the last (complete, cumulative) line.
    RESULT["errors"][name] = (
        f"Watchdog: stage exceeded {timeout_s}s — device call wedged "
        f"(backend initialized but execution never completed)"
    )
    snapshot()
    sys.stdout.flush()
    os._exit(0)


def stage(name, timeout_s=600):
    """Decorator-ish runner: returns fn() or records the error and
    re-snapshots. Never raises; a wedged device call trips the watchdog
    thread, which emits the snapshot and hard-exits."""

    def run(fn):
        dog = threading.Timer(timeout_s, _watchdog_fire, (name, timeout_s))
        dog.daemon = True
        dog.start()
        try:
            out = fn()
            return out
        except BaseException as e:  # noqa: BLE001 — must never crash
            tb = traceback.format_exc(limit=3)
            RESULT["errors"][name] = f"{type(e).__name__}: {e} | {tb[-400:]}"
            snapshot()
            return None
        finally:
            dog.cancel()

    return run


def kernel_smoke(jnp):
    """On-chip parity of the BVH + leaf-major kernels vs the XLA path.

    Runs BEFORE the 1080p sections so a heavyweight compile failure
    cannot erase the cheap Mosaic gate (VERDICT r3 weak #1)."""
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
    ok = True
    for got in (got_b, got_l):
        ok &= bool(jnp.all(got["tri"] == ref["tri"]))
    return ok


def main() -> int:
    snapshot()  # guarantee at least one parseable line exists

    def init_backend():
        import jax

        from prosper_tpu.scene.caches import enable_compile_cache

        enable_compile_cache()
        jax.devices()  # force backend init under the alarm
        return jax

    jax = stage("backend", timeout_s=180)(init_backend)
    if jax is None:
        return 0
    RESULT["backend"] = jax.default_backend()
    snapshot()

    import jax.numpy as jnp

    RESULT["kernel_smoke_ok"] = bool(
        stage("kernel_smoke", timeout_s=300)(lambda: kernel_smoke(jnp))
    )
    snapshot()

    # --- scene setup (shared by all three metrics)
    def setup():
        from prosper_tpu.ops.texture import pack_material_tables
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
        # geometry slabs prepped once like the CLI loop (static BLAS +
        # per-frame TLAS pacing; ops/trace.prepare_geometry)
        from prosper_tpu.ops import trace as _trace

        frame_dev["geom"] = _trace.GeometryCache().get(
            static, frame["transforms"], frame["normal_transforms"]
        )
        return world, static, arena_dev, frame_dev, cam

    ctx = stage("scene_setup", timeout_s=240)(setup)
    if ctx is None:
        return 0
    world, static, arena_dev, frame_dev, cam = ctx

    # --- metric 1: PT Mrays/s
    def bench_pt():
        from prosper_tpu.render.pt import pt_render_sample

        def run(i):
            return pt_render_sample(
                static, frame_dev, arena_dev, cam, WIDTH, HEIGHT, i,
                max_bounces=MAX_BOUNCES, return_stats=True,
            )

        for i in range(WARMUP_FRAMES):
            color, n_rays = run(i)
            float(color.mean())  # force (block_until_ready can return
            # early on this backend for pure-XLA tails)

        # Steady-state throughput with two frames in flight, exactly like
        # the CLI frame loop (MAX_FRAMES_IN_FLIGHT=2, src/utils/Utils.hpp:15):
        # frame i+1 is dispatched before blocking on frame i, so host prep /
        # dispatch latency overlaps device execution. Median inter-frame
        # completion interval is robust to tunnel hiccups.
        frames = []
        marks = [time.perf_counter()]
        prev = None
        for i in range(BENCH_FRAMES):
            color, n_rays = run(WARMUP_FRAMES + i)
            # The forcing reduction is enqueued immediately after ITS OWN
            # frame: blocking on it later waits only through frame i's
            # tail. (Blocking on a mean dispatched after frame i+1 —
            # the old structure — serialized the whole pipeline: the
            # device queue is in-order, so that mean completed only when
            # frame i+1 did. Measured: 166 ms/frame serialized vs 143
            # pipelined on the same build.)
            mean = color.mean()
            frames.append(n_rays)
            if prev is not None:
                float(prev)
                marks.append(time.perf_counter())
            prev = mean
        float(prev)
        marks.append(time.perf_counter())

        ray_counts = [int(n) for n in frames]
        per_frame = ray_counts[0]
        assert RAY_COUNT_SANITY[0] < per_frame < RAY_COUNT_SANITY[1], (
            f"rays/frame {per_frame} outside the band the 69 Mrays/s "
            f"baseline was derived from — re-derive BASELINE_MRAYS"
        )
        intervals = sorted(
            (marks[k + 1] - marks[k], ray_counts[k])
            for k in range(len(ray_counts))
        )
        mid = len(intervals) // 2
        return (
            intervals[mid - 1][1] / intervals[mid - 1][0]
            + intervals[mid][1] / intervals[mid][0]
        ) / 2.0 / 1e6

    mrays = stage("pt", timeout_s=480)(bench_pt)
    if mrays is not None:
        RESULT["value"] = round(mrays, 2)
        RESULT["vs_baseline"] = round(mrays / BASELINE_MRAYS, 3)
        snapshot()

    # --- metrics 2+3: deferred + ReSTIR ms/frame at 1024 lights
    def bench_modes():
        from prosper_tpu.ops.tonemap import load_tony_mc_mapface
        from prosper_tpu.render.frame import render_modes

        rng = np.random.default_rng(0)
        lo = world.wc_aabb_min_obj.min(axis=0)
        hi = world.wc_aabb_max_obj.max(axis=0)
        n_lights = 1024
        world.lights.point_position[:n_lights] = rng.uniform(
            lo, hi, (n_lights, 3)
        )
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
        lut = jnp.asarray(load_tony_mc_mapface())
        fns = render_modes()
        out = {}
        for mode in ("deferred", "restir"):
            render = fns[mode]
            state = None

            def run_mode(i, state):
                img, state = render(
                    static=static_l, frame=frame_dev, arena=arena_dev,
                    cam=cam, lut=lut, width=WIDTH, height=HEIGHT,
                    frame_index=i, state=state, max_bounces=MAX_BOUNCES,
                )
                return img, state

            for i in range(2):  # warmup/compile
                img, state = run_mode(i, state)
                float(img.mean())
            # Two frames in flight like the CLI loop (and the PT bench
            # above): per-frame forcing means enqueued with their own
            # frame, median inter-completion interval as the frame time.
            times = []
            prev = None
            t_prev = time.perf_counter()
            for i in range(7):
                img, state = run_mode(2 + i, state)
                mean = img.mean()
                if prev is not None:
                    float(prev)
                    t_now = time.perf_counter()
                    times.append(t_now - t_prev)
                    t_prev = t_now
                prev = mean
            float(prev)
            times.append(time.perf_counter() - t_prev)
            times.sort()
            out[mode] = times[len(times) // 2] * 1e3
            RESULT[f"{mode}_ms"] = round(out[mode], 1)
            snapshot()
        return out

    stage("modes", timeout_s=480)(bench_modes)
    snapshot()
    return 0


if __name__ == "__main__":
    sys.exit(main())
