#!/usr/bin/env python
"""On-TPU kernel smoke gate (VERDICT round-1 item 4).

Compiles and runs every Pallas kernel family on the real chip over a
small synthetic scene and checks agreement against the XLA reference
path (which also runs on-chip, so a Mosaic miscompile shows up as a
mismatch, not a plausible-looking render). Exits non-zero on failure.

Run serially (one TPU process at a time):  python scripts/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILURES = []
_DEADLINE = [float("inf")]  # pushed forward by check(); see _watchdog


def check(name, ok, detail=""):
    status = "ok" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)
    _touch_watchdog()


def _touch_watchdog():
    """Reset the per-stage watchdog bound: each completed check buys the
    NEXT stage a fresh window, so a slow-but-healthy cold-compile run is
    not mislabeled a wedge (the bound is per-stage, not whole-suite)."""
    import time

    if _DEADLINE[0] != float("inf"):
        _DEADLINE[0] = time.monotonic() + _STAGE_TIMEOUT_S


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("not on TPU; smoke gate is a no-op here")
        return 0
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from prosper_tpu.accel.bvh import build_bvh, pack_nodes
    from prosper_tpu.ops import trace, trace_bvh, trace_pallas
    from prosper_tpu.testing import make_test_scene

    static, frame, arena, cam_fn = make_test_scene(n_boxes=9)
    tris = {
        "v0": jnp.asarray(static["wt_p0"]),
        "e1": jnp.asarray(static["wt_p1"] - static["wt_p0"]),
        "e2": jnp.asarray(static["wt_p2"] - static["wt_p0"]),
    }
    wc_min = jnp.asarray(frame["wc_aabb_min_w"])
    wc_max = jnp.asarray(frame["wc_aabb_max_w"])
    bounds = jnp.asarray(frame["bvh_bounds"])
    meta = jnp.asarray(frame["bvh_meta"])
    packed9 = trace_pallas.pack_tris(tris)

    rng = np.random.default_rng(0)
    R = trace.TILE * 8
    o = jnp.asarray(rng.uniform(-6, 6, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    # ---- closest: XLA vs flat-list kernel vs BVH kernel ----
    ref = trace.trace_closest(tris, wc_min, wc_max, o, d, 1e-4, jnp.inf)
    flat = trace_pallas.trace_closest_pallas(
        packed9, wc_min, wc_max, o, d, 1e-4, jnp.inf
    )
    bvhh = trace_bvh.trace_closest_bvh(packed9, bounds, meta, o, d, 1e-4, jnp.inf)
    for name, got in [("trace_closest_flat", flat), ("trace_closest_bvh", bvhh)]:
        tri_match = float(jnp.mean((got["tri"] == ref["tri"]).astype(jnp.float32)))
        sel = ref["tri"] >= 0
        t_err = float(
            jnp.max(jnp.where(sel, jnp.abs(got["t"] - ref["t"]), 0.0))
        )
        check(name, tri_match == 1.0 and t_err < 1e-3,
              f"tri_match={tri_match:.5f} t_err={t_err:.2e}")

    # ---- any-hit ----
    ref_any = trace.trace_any(tris, wc_min, wc_max, o, d, 0.1, 8.0)
    flat_any = trace_pallas.trace_any_pallas(packed9, wc_min, wc_max, o, d, 0.1, 8.0)
    bvh_any = trace_bvh.trace_any_bvh(packed9, bounds, meta, o, d, 0.1, 8.0)
    check("trace_any_flat", bool(jnp.all(flat_any == ref_any)))
    check("trace_any_bvh", bool(jnp.all(bvh_any == ref_any)))

    # ---- fused-attribute kernel: finite attrs + t agreement ----
    from prosper_tpu.ops.trace_pallas_full import pack_tris_full
    static_dev = {
        k: jnp.asarray(v) for k, v in static.items() if k != "materials"
    }
    frame_dev = {
        k: jnp.asarray(v)
        for k, v in frame.items()
        if k not in ("lights", "scene_camera", "bvh_depth")
    }
    packed40 = pack_tris_full(static_dev, frame_dev, dtype=jnp.float32)
    full = trace_bvh.trace_closest_bvh_full(
        packed40, bounds, meta, o, d, 1e-4, jnp.inf
    )
    sel = ref["tri"] >= 0
    check(
        "trace_closest_bvh_full",
        bool(jnp.all(full["tri"] == ref["tri"]))
        and bool(jnp.all(jnp.isfinite(jnp.where(sel[:, None], full["normal"], 0.0)))),
    )

    # ---- in-kernel primary raygen (pt primary fast path) ----
    from prosper_tpu.mathx import rng as prng
    from prosper_tpu.ops.rays import pinhole_rays

    W = H = 64
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    fi = 5
    px_np, py_np, _ = trace.block_pixel_order(W, H)
    px, py = jnp.asarray(px_np), jnp.asarray(py_np)
    _, jitter = prng.rnd2d01(prng.make_state(px, py, jnp.uint32(fi)))
    uvj = (jnp.stack([px, py], -1).astype(jnp.float32) + jitter) / jnp.array(
        [W, H], jnp.float32
    )
    po, pd = pinhole_rays(cam, uvj)
    want = trace_bvh.trace_closest_bvh_full(
        packed40, bounds, meta, po, pd, 0.0, jnp.inf
    )
    cols_np, rows_np, R0 = trace_bvh.pack_pixels_np(px_np, py_np)
    got16 = trace_bvh.trace_primary_bvh_full(
        packed40, bounds, meta,
        jnp.asarray(cols_np), jnp.asarray(rows_np),
        trace_bvh.primary_cam_vec(cam, W, H),
        jnp.full((1, 4), fi, jnp.int32),
    )
    got = trace_bvh.unpack_hit16(got16[:R0])
    # jitter is pcg3d bit-parity; a Mosaic u32->f32 convert quirk would
    # only flip silhouette-edge pixels, so demand near-total agreement
    tri_match = float(jnp.mean((got["tri"] == want["tri"]).astype(jnp.float32)))
    bothp = (got["tri"] >= 0) & (want["tri"] >= 0) & (got["tri"] == want["tri"])
    terr_p = float(jnp.max(jnp.where(bothp, jnp.abs(got["t"] - want["t"]), 0.0)))
    check("trace_primary_raygen", tri_match > 0.999 and terr_p < 1e-3,
          f"tri_match={tri_match:.5f} t_err={terr_p:.2e}")

    # ---- f16 at-rest geometry quantization. Mosaic rejects f16 refs
    # in-kernel ("Unsupported type in mosaic dialect: 'f16'", v5e r4),
    # so quantize at rest and ship the slabs f32: this validates the
    # Mesh.hpp:11-15 precision budget without f16 inside the kernel.
    packed40h = pack_tris_full(static_dev, frame_dev, dtype=jnp.float16)
    packed40h = packed40h.astype(jnp.float32)
    fullh = trace_bvh.trace_closest_bvh_full(
        packed40h, bounds, meta, o, d, 1e-4, jnp.inf
    )
    agree = float(jnp.mean((fullh["tri"] == ref["tri"]).astype(jnp.float32)))
    both = (fullh["tri"] >= 0) & sel
    # f16 vertex quantization error is RELATIVE to coordinate magnitude
    # (10-bit mantissa ~ 4.9e-4 per vertex coordinate, compounded through
    # Möller), NOT to t: a short ray grazing far geometry shows a large
    # |dt|/t with a tiny vertex displacement. Bound |dt| by the scene
    # extent times the f16 mantissa step (with 4x slack for edge-plane
    # amplification) — on this scene tri agreement stays 100% and only t
    # wiggles (v5e r4: abs 5.1e-3, rel 7.1e-3 — both pure quantization).
    extent = float(jnp.max(wc_max) - jnp.min(wc_min))
    t_cap = extent * 4.9e-4 * 4.0
    terr = float(jnp.max(jnp.where(both, jnp.abs(fullh["t"] - ref["t"]), 0.0)))
    check("trace_closest_bvh_full_f16", agree > 0.99 and terr < t_cap,
          f"tri_agree={agree:.4f} t_err={terr:.2e} cap={t_cap:.2e}")

    # ---- leaf-major pair tracer (bounce/shadow path) ----
    from prosper_tpu.ops import trace_leafmajor

    lm = trace_leafmajor.trace_closest_leafmajor(
        packed9, wc_min, wc_max, o, d, 1e-4, jnp.inf
    )
    check(
        "trace_closest_leafmajor",
        bool(jnp.all(lm["tri"] == ref["tri"]))
        and float(
            jnp.max(jnp.where(sel, jnp.abs(lm["t"] - ref["t"]), 0.0))
        ) < 1e-3
        and not bool(lm["_overflow"]),
    )
    lm_any, lm_ovf = trace_leafmajor.trace_any_leafmajor(
        packed9, wc_min, wc_max, o, d, 0.1, 8.0
    )
    check(
        "trace_any_leafmajor",
        bool(jnp.all(lm_any == ref_any)) and not bool(lm_ovf),
    )

    # ---- leaf-major over FULL 40-row slabs + attr interpolation ----
    lmf = trace_leafmajor.trace_closest_leafmajor_full(
        packed40, wc_min, wc_max, o, d, 1e-4, jnp.inf
    )
    check(
        "trace_closest_leafmajor_full",
        bool(jnp.all(lmf["tri"] == full["tri"]))
        and float(
            jnp.max(
                jnp.where(
                    sel[:, None], jnp.abs(lmf["normal"] - full["normal"]), 0.0
                )
            )
        ) < 1e-3,
    )

    # ---- overflow-safe wrappers (packet fallback inside lax.cond) ----
    lms = trace_leafmajor.trace_closest_leafmajor_safe(
        packed9, bounds, meta, wc_min, wc_max, o, d, 1e-4, jnp.inf
    )
    lms_any = trace_leafmajor.trace_any_leafmajor_safe(
        packed40, bounds, meta, wc_min, wc_max, o, d, 0.1, 8.0
    )
    check(
        "leafmajor_safe",
        bool(jnp.all(lms["tri"] == ref["tri"]))
        and bool(jnp.all(lms_any == ref_any)),
    )

    # ---- per-cluster skip mask (culling riding the BVH kernel) ----
    hit_c = jnp.unique(jnp.where(sel, ref["tri"] // 128, -1), size=4)
    skip_c = int(hit_c[hit_c >= 0][0])  # skip one cluster rays DO hit
    mask = jnp.ones((wc_min.shape[0],), jnp.int32).at[skip_c].set(0)
    masked = trace_bvh.trace_closest_bvh_full(
        packed40, bounds, meta, o, d, 1e-4, jnp.inf, skip_mask=mask
    )
    # masked trace must never report a hit in the skipped cluster, and
    # must agree with the unmasked trace wherever the winner survives
    in_skipped = (masked["tri"] >= 0) & (masked["tri"] // 128 == skip_c)
    keep = sel & (full["tri"] // 128 != skip_c)
    check(
        "skip_mask_culling",
        not bool(jnp.any(in_skipped))
        and bool(
            jnp.all(jnp.where(keep, masked["tri"] == full["tri"], True))
        ),
    )

    # ---- dense-cull descent (bounce/shadow alternative; round 4) ----
    dn = trace_bvh.trace_closest_bvh_dense(
        packed9, bounds, meta, o, d, 1e-4, jnp.inf, tile=128
    )
    check(
        "trace_closest_bvh_dense",
        bool(jnp.all(dn["tri"] == ref["tri"]))
        and float(
            jnp.max(jnp.where(sel, jnp.abs(dn["t"] - ref["t"]), 0.0))
        ) < 1e-3,
    )
    dn_any = trace_bvh.trace_any_bvh_dense(
        packed9, bounds, meta, o, d, 0.1, 8.0, tile=256
    )
    check("trace_any_bvh_dense", bool(jnp.all(dn_any == ref_any)))
    masked_dn = trace_bvh.trace_closest_bvh_dense(
        packed9, bounds, meta, o, d, 1e-4, jnp.inf,
        skip_mask=jnp.ones((wc_min.shape[0],), jnp.int32),
    )
    check(
        "trace_closest_bvh_dense_mask",
        bool(jnp.all(masked_dn["tri"] == ref["tri"])),
    )

    # ---- primary tile mask (dead ray tiles skip raygen in-kernel) ----
    tmask = trace_bvh.primary_tile_mask(
        trace_bvh.primary_cam_vec(cam, W, H),
        jnp.asarray(trace_bvh.tile_px_bounds_np(px_np, py_np)),
        wc_min,
        wc_max,
    )
    got16m = trace_bvh.trace_primary_bvh_full(
        packed40, bounds, meta,
        jnp.asarray(cols_np), jnp.asarray(rows_np),
        trace_bvh.primary_cam_vec(cam, W, H),
        jnp.full((1, 4), fi, jnp.int32),
        tile_mask=tmask,
    )
    gotm = trace_bvh.unpack_hit16(got16m[:R0])
    check(
        "trace_primary_tile_mask",
        bool(jnp.all(gotm["tri"] == got["tri"])),
        f"live_tiles={float(jnp.mean(tmask.astype(jnp.float32))):.3f}",
    )

    # ---- tile-major clustered shading vs XLA froxel path ----
    from prosper_tpu.ops import clustering
    from prosper_tpu.ops.shade_tiles import shade_clustered_tiles
    from prosper_tpu.ops.rays import pinhole_rays
    from prosper_tpu.scene.lights import LightArrays, light_uniforms

    W = H = 128
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    la = LightArrays()
    n_pt = 24
    la.point_count = n_pt
    la.point_position[:n_pt] = rng.uniform(-4, 4, (n_pt, 3))
    la.point_radiance[:n_pt] = rng.uniform(0.5, 5.0, (n_pt, 3))
    la.point_radius[:n_pt] = rng.uniform(1.0, 6.0, n_pt)
    lights = {k: jnp.asarray(v) for k, v in light_uniforms(la).items()}

    px = jnp.tile(jnp.arange(W, dtype=jnp.int32), H)
    py = jnp.repeat(jnp.arange(H, dtype=jnp.int32), W)
    uv = (jnp.stack([px, py], -1).astype(jnp.float32) + 0.5) / jnp.array(
        [W, H], jnp.float32
    )
    ro, rd = pinhole_rays(cam, uv)
    depth = jnp.asarray(rng.uniform(1.0, 12.0, W * H).astype(np.float32))
    pos = ro + rd * depth[:, None]
    n = jnp.asarray(rng.normal(size=(W * H, 3)).astype(np.float32))
    n = n / jnp.linalg.norm(n, axis=1, keepdims=True)
    ivr = cam["eye"] - pos
    ivr = ivr / jnp.maximum(jnp.linalg.norm(ivr, axis=-1, keepdims=True), 1e-20)
    surface = {
        "position_ws": pos,
        "normal_ws": n,
        "inv_view_ray": ivr,
        "albedo": jnp.asarray(rng.uniform(0, 1, (W * H, 3)).astype(np.float32)),
        "roughness": jnp.asarray(rng.uniform(0.05, 1, W * H).astype(np.float32)),
        "metallic": jnp.asarray(rng.uniform(0, 1, W * H).astype(np.float32)),
        "NoV": jnp.clip(jnp.sum(n * ivr, axis=-1), 0.0, 1.0),
    }
    w2c = cam["world_to_camera"]
    z_cam = pos @ w2c[2, :3] + w2c[2, 3]
    valid = jnp.ones((W * H,), bool)
    clusters = clustering.build_light_clusters(cam, lights, W, H)
    want = clustering.eval_clustered_lights(
        surface, lights, clusters, px, py, z_cam, cam["near"], cam["far"]
    )
    got = shade_clustered_tiles(surface, lights, cam, z_cam, valid, W, H)
    err = float(
        jnp.max(jnp.abs(got - want) / (jnp.abs(want) + 1e-2))
    )
    check("shade_clustered_tiles", err < 1e-2, f"rel_err={err:.2e}")

    # ---- block16 pixel-order shading path (the deferred fast path) ----
    from prosper_tpu.ops import trace as _tr

    pxb, pyb, _hp = _tr.block_order_padded(W, H)
    blk = _tr.rows_to_blocks
    surface_b = {k: blk(v, W, H) for k, v in surface.items()}
    got_b = shade_clustered_tiles(
        surface_b, lights, cam, blk(z_cam, W, H),
        blk(valid, W, H), W, H, pixel_order="block16",
    )
    err_b = float(
        jnp.max(
            jnp.abs(_tr.blocks_to_rows(got_b, W, H) - want)
            / (jnp.abs(want) + 1e-2)
        )
    )
    check("shade_clustered_tiles_block16", err_b < 1e-2, f"rel_err={err_b:.2e}")

    # ---- IBL GGX prefilter finiteness (round-1 miscompile class) ----
    from prosper_tpu.ops.ibl import prefilter_radiance

    env = jnp.abs(
        jnp.asarray(rng.normal(size=(6, 64, 64, 3)).astype(np.float32))
    )
    mips = prefilter_radiance(env, res=64, n_mips=4, n_samples=64)
    finite = all(bool(jnp.all(jnp.isfinite(m))) for m in mips)
    check("ibl_prefilter_radiance", finite)

    print(("SMOKE PASS" if not FAILURES else f"SMOKE FAIL: {FAILURES}"), flush=True)
    return 1 if FAILURES else 0


def _write_artifact(rc, error=None):
    """TPU_SMOKE.json at the repo root: a driver-independent record of
    the on-chip gate (VERDICT r3 item 5) captured by the round snapshot
    even when the 1080p bench cannot run."""
    import json

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TPU_SMOKE.json",
    )
    with open(path, "w") as f:
        json.dump(
            {
                "ok": rc == 0 and error is None,
                "rc": rc,
                "failures": FAILURES,
                "error": error,
            },
            f,
        )
        f.write("\n")


# Per-STAGE bound (reset by every completed check), not whole-suite:
# the first stage additionally covers backend init + the first cold
# compile, so it gets the same generous window each later stage does.
_STAGE_TIMEOUT_S = 300


def _watchdog():
    """A wedged device call blocks in the runtime and never raises, so
    the except-clause below can't save the artifact (observed tunnel
    failure mode: backend init succeeds, first execute hangs forever).
    A poller thread watches a deadline that check() pushes forward: the
    bound is time-since-last-completed-stage, so a slow-but-healthy
    cold-cache suite is not mislabeled a wedge (ADVICE r4)."""
    import threading
    import time

    _DEADLINE[0] = time.monotonic() + _STAGE_TIMEOUT_S

    def poll():
        while True:
            time.sleep(5)
            if time.monotonic() > _DEADLINE[0]:
                _write_artifact(
                    3,
                    f"Watchdog: >{_STAGE_TIMEOUT_S}s since the last "
                    f"completed stage — device call wedged (backend "
                    f"initialized but execution never completed)",
                )
                os._exit(3)

    t = threading.Thread(target=poll, daemon=True)
    t.start()


if __name__ == "__main__":
    _watchdog()
    try:
        rc = main()
        _DEADLINE[0] = float("inf")
        _write_artifact(rc)
    except BaseException as e:  # noqa: BLE001 — the artifact must exist
        import traceback

        _DEADLINE[0] = float("inf")
        _write_artifact(2, f"{type(e).__name__}: {e}")
        traceback.print_exc()
        rc = 2
    sys.exit(rc)
