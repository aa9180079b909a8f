#!/usr/bin/env python
"""In-situ cost split of the PRODUCTION bounce-closest trace: the real
FlightHelmet bounce set, plain 9-row kernel, tile=128, cluster-major
sort — full vs DEBUG_NO_MOLLER vs DEBUG_NO_DMA, plus DEBUG_VISITS union
counts. NB: no-Möller traversal never shrinks per-ray bounds, so its
visit set is the UNBOUNDED one (~35 % more leaf visits than full);
the Möller share is bounded between (full - nomoller) and full's
per-visit share at equal visits. Serial TPU use.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080
TILE = 128


def timeit(fn, force, n=5, warmup=2):
    for _ in range(warmup):
        force(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        force(fn())
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from prosper_tpu.ops import trace, trace_bvh
    from prosper_tpu.ops.rays import pinhole_rays
    from prosper_tpu.ops.trace_pallas_full import pack_tris_full
    from prosper_tpu.scene.world import World

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
    bounds = frame_dev["bvh_bounds"]
    meta = frame_dev["bvh_meta"]
    packed40 = jax.block_until_ready(pack_tris_full(static, frame_dev))

    cam_obj = world.make_camera((WIDTH, HEIGHT))
    cam = {k: jnp.asarray(v) for k, v in cam_obj.uniforms().items()}
    px_np, py_np, _ = trace.block_pixel_order(WIDTH, HEIGHT)
    uv = (
        jnp.stack([jnp.asarray(px_np), jnp.asarray(py_np)], -1).astype(
            jnp.float32
        )
        + 0.5
    ) / jnp.array([WIDTH, HEIGHT], jnp.float32)
    ray_o, ray_d = pinhole_rays(cam, uv)

    hit = trace_bvh.trace_closest_bvh_full(
        packed40, bounds, meta, ray_o, ray_d, 0.0, jnp.inf
    )
    hit = jax.block_until_ready(hit)

    t = np.asarray(hit["t"])
    tri = np.asarray(hit["tri"])
    n = np.asarray(hit["normal"])
    o = np.asarray(ray_o) + t[:, None] * np.asarray(ray_d)
    live = tri >= 0
    idx = np.nonzero(live)[0]
    print(f"live bounce rays: {idx.size}")
    rng = np.random.default_rng(0)
    nrm = n[idx]
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    u1, u2 = rng.random(idx.size), rng.random(idx.size)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    tang = np.cross(nrm, np.where(np.abs(nrm[:, :1]) < 0.9,
                                  [[1.0, 0, 0]], [[0, 1.0, 0]]))
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    bit = np.cross(nrm, tang)
    d = (
        tang * (r * np.cos(phi))[:, None]
        + bit * (r * np.sin(phi))[:, None]
        + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]
    ).astype(np.float32)
    o2 = (o[idx] + 1e-4 * nrm).astype(np.float32)
    cluster = tri[idx] // trace.CLUSTER_PAD

    pad = (-idx.size) % 2048
    o2 = np.pad(o2, ((0, pad), (0, 0)))
    d2 = np.pad(d, ((0, pad), (0, 0)))
    tmax = np.pad(np.full(idx.size, np.inf, np.float32), (0, pad))
    cl = np.pad(cluster, (0, pad))
    R = o2.shape[0]

    # production sort: cluster-major, dead rays (tmax 0) to the tail
    ad = np.abs(d2)
    denom = np.maximum(ad.sum(1), 1e-20)
    ox, oy = d2[:, 0] / denom, d2[:, 1] / denom
    fold = d2[:, 2] < 0
    ox2 = np.where(fold, (1 - np.abs(oy)) * np.sign(ox), ox)
    oy2 = np.where(fold, (1 - np.abs(ox)) * np.sign(oy), oy)
    bx = np.clip(((ox2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    by = np.clip(((oy2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    oct_ = (bx * 8 + by) * 2 + fold.astype(np.int32)
    key = np.where(tmax > 0, cl * 128 + oct_, 2**30)
    perm = np.argsort(key, kind="stable")
    o_s = jnp.asarray(o2[perm])
    d_s = jnp.asarray(d2[perm])
    tm = jnp.asarray(tmax[perm])

    def run_mode(label):
        jax.clear_caches()
        fn = jax.jit(
            lambda: trace_bvh.trace_closest_bvh(
                packed40, bounds, meta, o_s, d_s, 0.0, tm, tile=TILE,
                packed=True,
            )
        )
        ms = timeit(fn, jax.block_until_ready)
        print(f"{label:10s} {ms:7.2f} ms  "
              f"({idx.size / ms / 1e3:6.2f} M live rays/s)")
        return ms, fn

    ms_full, fn = run_mode("full")
    out = np.asarray(fn())
    hits = int((out[: idx.size, 1] >= 0).sum())
    print(f"  hits: {hits}/{idx.size}")

    trace_bvh.DEBUG_VISITS = True
    jax.clear_caches()
    outv = np.asarray(
        jax.jit(
            lambda: trace_bvh.trace_closest_bvh(
                packed40, bounds, meta, o_s, d_s, 0.0, tm, tile=TILE,
                packed=True,
            )
        )()
    )
    visits = outv[::TILE, 7]
    n_live_tiles = int((np.asarray(tm).reshape(-1, TILE).max(1) > 0).sum())
    print(
        f"  union visits: total {visits.sum():.0f}, "
        f"mean/packet {visits.sum() / max(n_live_tiles, 1):.1f} "
        f"({n_live_tiles} live packets), per live ray "
        f"{visits.sum() / idx.size:.2f}"
    )
    trace_bvh.DEBUG_VISITS = False

    trace_bvh.DEBUG_NO_MOLLER = True
    run_mode("nomoller")
    trace_bvh.DEBUG_NO_MOLLER = False
    trace_bvh.DEBUG_NO_DMA = True
    run_mode("nodma")
    trace_bvh.DEBUG_NO_DMA = False
    print(f"full {ms_full:.2f} ms over {idx.size} rays = "
          f"{ms_full * 1e3 / idx.size:.3f} us/ray")


if __name__ == "__main__":
    main()
