#!/usr/bin/env python
"""Headline benchmark: all three BASELINE metrics at 1080p.

ARCHITECTURE (VERDICT r4 item 1): a PARENT orchestrator that runs each
stage — {smoke, pt, deferred, restir} — in its OWN SUBPROCESS, with the
watchdog in the parent. A wedged device call (the observed tunnel
failure mode: backend init succeeds, then the first execute blocks
forever in a futex wait) kills only that stage's child; the parent
kills it, waits for the tunnel to settle, and retries ONCE before
recording the stage error and moving on. One transient wedge costs one
stage one retry — not the round's evidence. The reference's analog of
this recover-don't-crash posture is the swapchain out-of-date recreate
loop (/root/reference/src/App.cpp:642-670: recreate, retry, continue).

The parent imports NO jax. It prints cumulative JSON snapshot lines,
one after each completed stage, so the LAST line on stdout is always
the best-available merged result:

  {"metric": "pt_mrays_per_s", "value": N, "unit": "Mrays/s",
   "vs_baseline": N, "deferred_ms": N, "restir_ms": N,
   "kernel_smoke_ok": true, "backend": "tpu", "errors": {...}}

Children are invoked as `bench.py --stage NAME`; each prints progress
to stderr and ONE stage-result JSON line to stdout. A child also runs
an in-process watchdog thread slightly under the parent's bound so a
wedge usually produces a labeled child-side error (exit code 3,
matching scripts/tpu_smoke.py) before the parent's SIGKILL.

Baseline derivation (BASELINE.md): the north-star target is a
path-traced frame at 1080p >= 30 FPS on one TPU v5e chip. At 1080p with
3 bounces this scene traces ~2.3M rays/frame (measured by the
instrumented tracer), so 30 FPS corresponds to ~69 Mrays/s and
vs_baseline = measured / 69; >= 1.0 means the target is met. If the
live instrumented ray count falls outside the band the 69 was derived
from (a different scene or bounce count), the child RE-DERIVES the
baseline from the live count (30 FPS x rays/frame) instead of
hard-failing, and reports both numbers (VERDICT r4 weak #7).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time
import traceback

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080
MAX_BOUNCES = 3
WARMUP_FRAMES = 2
BENCH_FRAMES = 8

# 30 FPS x (rays actually traced per 1080p frame at 3 bounces for this
# scene: ~2.3M — primary 2.07M + the shadow/bounce mix of the
# 6%-coverage helmet, measured by the same instrumented kernel).
BASELINE_MRAYS = 69.0
RAY_COUNT_SANITY = (1.8e6, 3.2e6)  # band the 69 Mrays/s was derived from
TARGET_FPS = 30.0

# Stage table: (name, child timeout_s, parent timeout_s). Parent bound
# is child bound + grace so the child's own watchdog usually fires
# first and leaves a labeled error on stdout. Smoke gets cold-compile
# headroom (ADVICE r4: a slow-but-healthy first compile is not a wedge).
STAGES = (
    ("smoke", 900, 930),  # full tpu_smoke suite; cold-compile headroom
    ("pt", 600, 630),
    ("deferred", 540, 570),
    ("restir", 540, 570),
)
RETRY_PAUSE_S = 60  # observed wedges clear "minutes later"; give it one

# Harness-test hooks (tests/test_bench_harness.py simulates a wedge
# without a device): global timeout overrides, retry-pause override,
# canned child results, and a child that sleeps forever. These exist so
# the recover-and-retry machinery itself is testable; they are not
# renderer configuration (that lives in the CLI/TOML layer).
_ENV_CHILD_TIMEOUT = "BENCH_CHILD_TIMEOUT_S"
_ENV_PARENT_TIMEOUT = "BENCH_PARENT_TIMEOUT_S"
_ENV_RETRY_PAUSE = "BENCH_RETRY_PAUSE_S"
_ENV_FAKE_RESULT = "BENCH_FAKE_RESULT"
_ENV_SIMULATE_WEDGE = "BENCH_SIMULATE_WEDGE"  # "stage" or "stage:attempt"


def _stage_plan():
    ct = os.environ.get(_ENV_CHILD_TIMEOUT)
    pt_ = os.environ.get(_ENV_PARENT_TIMEOUT)
    for name, c, p in STAGES:
        yield name, (float(ct) if ct else c), (float(pt_) if pt_ else p)


# --------------------------------------------------------------------------
# Parent: orchestrate stage subprocesses, merge, snapshot cumulatively.

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


def _last_json_line(text: str):
    """Last stdout line that parses as a JSON object with a "stage" key."""
    for line in reversed(text.splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and "stage" in obj:
            return obj
    return None


def _run_stage_child(name: str, parent_timeout_s: float, extra_env=None, attempt=1):
    """One attempt: spawn `bench.py --stage name`, bound it, parse."""
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    env["BENCH_ATTEMPT"] = str(attempt)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--stage", name],
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        text=True,
        env=env,
    )
    try:
        out, _ = proc.communicate(timeout=parent_timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
        obj = _last_json_line(out or "")
        return None, (
            f"parent watchdog: stage exceeded {parent_timeout_s}s — device "
            f"call wedged (child killed)"
            + (f"; child partial: {obj.get('error')}" if obj and obj.get("error") else "")
        )
    obj = _last_json_line(out or "")
    if obj is None:
        return None, f"child rc={proc.returncode}, no parseable stage JSON"
    if obj.get("error"):
        return None, f"child rc={proc.returncode}: {obj['error']}"
    return obj, None


def run_stage(name: str, child_timeout_s: float, parent_timeout_s: float):
    """Run a stage with ONE retry on any failure (wedge, crash, garbage).

    Returns the stage-result dict or records RESULT["errors"][name]."""
    extra_env = {"BENCH_STAGE_TIMEOUT_S": str(child_timeout_s)}
    obj, err = _run_stage_child(name, parent_timeout_s, extra_env, attempt=1)
    if obj is not None:
        return obj
    pause = float(os.environ.get(_ENV_RETRY_PAUSE, RETRY_PAUSE_S))
    print(
        f"[bench] stage {name} attempt 1 failed ({err}); retrying in "
        f"{pause}s",
        file=sys.stderr,
        flush=True,
    )
    RESULT["errors"][f"{name}_attempt1"] = err
    snapshot()
    time.sleep(pause)
    obj, err2 = _run_stage_child(name, parent_timeout_s, extra_env, attempt=2)
    if obj is not None:
        # recovered: the attempt-1 record stays for legibility, but the
        # stage itself succeeded.
        return obj
    RESULT["errors"][name] = err2
    return None


def merge(name: str, obj: dict):
    if obj is None:
        return
    if obj.get("backend") and RESULT["backend"] is None:
        RESULT["backend"] = obj["backend"]
    if name == "smoke":
        RESULT["kernel_smoke_ok"] = bool(obj.get("ok"))
    elif name == "pt":
        RESULT["value"] = obj.get("value")
        RESULT["vs_baseline"] = obj.get("vs_baseline")
        for k in ("rays_per_frame", "derived_baseline_mrays"):
            if obj.get(k) is not None:
                RESULT[k] = obj[k]
    elif name in ("deferred", "restir"):
        RESULT[f"{name}_ms"] = obj.get("ms")


def parent_main() -> int:
    snapshot()  # guarantee at least one parseable line exists
    for name, child_t, parent_t in _stage_plan():
        obj = run_stage(name, child_t, parent_t)
        merge(name, obj)
        snapshot()
    return 0


# --------------------------------------------------------------------------
# Child: run ONE stage under an in-process watchdog, print stage JSON.

_SNAP_LOCK = threading.Lock()  # ADVICE r4: watchdog vs main-thread print race


def _child_emit(obj: dict):
    with _SNAP_LOCK:
        print(json.dumps(obj), flush=True)


def _child_watchdog(stage_name: str, timeout_s: float):
    _child_emit(
        {
            "stage": stage_name,
            "error": (
                f"watchdog: stage exceeded {timeout_s}s — device call wedged "
                f"(backend initialized but execution never completed)"
            ),
        }
    )
    # Distinct nonzero code (ADVICE r4): a wedged run must not look like
    # a pass to rc-gating callers. Parent parses stdout regardless.
    os._exit(3)


def _setup_scene(jnp, with_lights: bool):
    from prosper_tpu.ops.texture import pack_material_tables
    from prosper_tpu.scene.textures import build_texture_arena
    from prosper_tpu.scene.world import World

    world = World(SCENE)
    if with_lights:
        import numpy as np

        rng = np.random.default_rng(0)
        lo = world.wc_aabb_min_obj.min(axis=0)
        hi = world.wc_aabb_max_obj.max(axis=0)
        n_lights = 1024
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
    return world, static, arena_dev, frame_dev, cam


def stage_smoke(jax, jnp) -> dict:
    """Full on-chip kernel smoke suite via scripts/tpu_smoke.py — every
    Pallas kernel family vs the XLA path on the real chip. Running it
    here means the driver's end-of-round bench REFRESHES TPU_SMOKE.json
    (VERDICT r4 weak #8: the gate artifact was a point-in-time snapshot
    only as fresh as the last manual tunnel session). tpu_smoke has its
    own per-stage-reset watchdog and always writes the artifact."""
    root = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(root, "scripts"))
    import tpu_smoke

    # run in-process (one TPU holder at a time); the bench child's own
    # watchdog bounds a wedge, and tpu_smoke's deadline poller stays
    # dormant outside its __main__. The artifact is written either way.
    rc = tpu_smoke.main()
    tpu_smoke._write_artifact(rc)
    return {"ok": rc == 0, "failures": list(tpu_smoke.FAILURES)}


def stage_pt(jax, jnp) -> dict:
    from prosper_tpu.render.pt import pt_render_sample

    world, static, arena_dev, frame_dev, cam = _setup_scene(jnp, with_lights=False)

    def run(i):
        return pt_render_sample(
            static, frame_dev, arena_dev, cam, WIDTH, HEIGHT, i,
            max_bounces=MAX_BOUNCES, return_stats=True,
        )

    for i in range(WARMUP_FRAMES):
        color, n_rays = run(i)
        float(color.mean())  # force (block_until_ready can return early
        # on this backend for pure-XLA tails)

    # Steady-state throughput with two frames in flight, exactly like
    # the CLI frame loop (MAX_FRAMES_IN_FLIGHT=2, src/utils/Utils.hpp:15):
    # frame i+1 is dispatched before blocking on frame i. The forcing
    # reduction is enqueued with ITS OWN frame so blocking on it waits
    # only through frame i's tail (measured: 166 ms/frame serialized vs
    # 143 pipelined on the same build). Median inter-frame completion
    # interval is robust to tunnel hiccups.
    frames = []
    marks = [time.perf_counter()]
    prev = None
    for i in range(BENCH_FRAMES):
        color, n_rays = run(WARMUP_FRAMES + i)
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
    baseline = BASELINE_MRAYS
    derived = None
    if not (RAY_COUNT_SANITY[0] < per_frame < RAY_COUNT_SANITY[1]):
        # A different scene / bounce count: re-derive the 30 FPS budget
        # from the live instrumented count instead of hard-failing
        # (VERDICT r4 weak #7). vs_baseline stays "fraction of 30 FPS".
        derived = round(TARGET_FPS * per_frame / 1e6, 2)
        baseline = derived
    intervals = sorted(
        (marks[k + 1] - marks[k], ray_counts[k]) for k in range(len(ray_counts))
    )
    mid = len(intervals) // 2
    mrays = (
        intervals[mid - 1][1] / intervals[mid - 1][0]
        + intervals[mid][1] / intervals[mid][0]
    ) / 2.0 / 1e6
    return {
        "value": round(mrays, 2),
        "vs_baseline": round(mrays / baseline, 3),
        "rays_per_frame": per_frame,
        "derived_baseline_mrays": derived,
    }


def stage_mode(jax, jnp, mode: str) -> dict:
    import numpy as np

    from prosper_tpu.ops.tonemap import load_tony_mc_mapface
    from prosper_tpu.render.frame import render_modes

    world, static_l, arena_dev, frame_dev, cam = _setup_scene(jnp, with_lights=True)
    lut = jnp.asarray(load_tony_mc_mapface())
    render = render_modes()[mode]
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
    # Two frames in flight like the CLI loop (and the PT stage): per-
    # frame forcing means enqueued with their own frame, median inter-
    # completion interval as the frame time.
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
    return {"ms": round(times[len(times) // 2] * 1e3, 1)}


def child_main(stage_name: str) -> int:
    timeout_s = float(os.environ.get("BENCH_STAGE_TIMEOUT_S", "600"))
    dog = threading.Timer(timeout_s, _child_watchdog, (stage_name, timeout_s))
    dog.daemon = True
    dog.start()
    # Harness-test hooks: simulate a wedged device call (sleep forever,
    # under the watchdog, exactly where a real stage would block) and
    # canned results so the parent machinery is testable without a chip.
    wedge = os.environ.get(_ENV_SIMULATE_WEDGE, "")
    if wedge:
        target, _, att = wedge.partition(":")
        if target == stage_name and (not att or att == os.environ.get("BENCH_ATTEMPT", "1")):
            time.sleep(10**6)
    if os.environ.get(_ENV_FAKE_RESULT):
        canned = {
            "smoke": {"ok": True},
            "pt": {"value": 1.0, "vs_baseline": 0.014, "rays_per_frame": 2_000_000,
                   "derived_baseline_mrays": None},
            "deferred": {"ms": 1.0},
            "restir": {"ms": 2.0},
        }[stage_name]
        canned.update({"stage": stage_name, "backend": "fake"})
        dog.cancel()
        _child_emit(canned)
        return 0
    try:
        import jax

        from prosper_tpu.scene.caches import enable_compile_cache

        enable_compile_cache()
        jax.devices()  # force backend init under the watchdog
        import jax.numpy as jnp

        if stage_name == "smoke":
            out = stage_smoke(jax, jnp)
        elif stage_name == "pt":
            out = stage_pt(jax, jnp)
        elif stage_name in ("deferred", "restir"):
            out = stage_mode(jax, jnp, stage_name)
        else:
            raise ValueError(f"unknown stage {stage_name}")
        out["stage"] = stage_name
        out["backend"] = jax.default_backend()
        dog.cancel()
        _child_emit(out)
        return 0
    except BaseException as e:  # noqa: BLE001 — record, don't crash silently
        dog.cancel()
        tb = traceback.format_exc(limit=3)
        _child_emit(
            {"stage": stage_name, "error": f"{type(e).__name__}: {e} | {tb[-400:]}"}
        )
        return 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None, help="(internal) run one stage")
    args = ap.parse_args()
    if args.stage:
        return child_main(args.stage)
    return parent_main()


if __name__ == "__main__":
    sys.exit(main())
