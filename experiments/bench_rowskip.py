#!/usr/bin/env python
"""A/B of the row-skip fused closest kernel (PT_ROWSKIP) at tile=128 on
the real sorted bounce wavefront + the shadow set. Serial TPU use."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"
WIDTH, HEIGHT = 1920, 1080


def main():
    import jax

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from prosper_tpu.ops import trace, trace_bvh
    from prosper_tpu.ops.rays import pinhole_rays
    from prosper_tpu.ops.trace_pallas_full import pack_tris_full
    from prosper_tpu.scene.world import World
    from prosper_tpu.utils.profiler import profile_device_ops

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

    cam = {
        k: jnp.asarray(v)
        for k, v in world.make_camera((WIDTH, HEIGHT)).uniforms().items()
    }
    px_np, py_np, _ = trace.block_pixel_order(WIDTH, HEIGHT)
    px, py = jnp.asarray(px_np), jnp.asarray(py_np)
    uv = (jnp.stack([px, py], -1).astype(jnp.float32) + 0.5) / jnp.array(
        [WIDTH, HEIGHT], jnp.float32
    )
    o, d0 = pinhole_rays(cam, uv)
    hit = jax.block_until_ready(
        trace_bvh.trace_closest_bvh_full(
            packed40, bounds, meta, o, d0, 1e-4, jnp.inf
        )
    )
    tri = np.asarray(hit["tri"])
    live = tri >= 0
    t = np.asarray(hit["t"])[live]
    n = np.asarray(hit["normal"])[live]
    o_np = np.asarray(o)[live]
    d_np = np.asarray(d0)[live]
    pos = o_np + t[:, None] * d_np
    cluster = (tri[live] // trace.CLUSTER_PAD).astype(np.int32)
    print(f"live rays: {pos.shape[0]}")

    rs = np.random.RandomState(0)
    u1, u2 = rs.rand(pos.shape[0]), rs.rand(pos.shape[0])
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    tx = np.cross(
        n, np.where(np.abs(n[:, 2:3]) < 0.9, [0, 0, 1.0], [1.0, 0, 0])
    )
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-12)
    ty = np.cross(n, tx)
    d = (
        tx * (r * np.cos(phi))[:, None]
        + ty * (r * np.sin(phi))[:, None]
        + n * np.sqrt(np.maximum(1 - u1, 0.0))[:, None]
    )
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    o2 = pos + n * 1e-3

    # sort like render/pt.py (origin cluster, direction octant)
    ad = np.abs(d)
    denom = np.maximum(ad.sum(1), 1e-20)
    ox, oy = d[:, 0] / denom, d[:, 1] / denom
    fold = d[:, 2] < 0
    ox2 = np.where(fold, (1 - np.abs(oy)) * np.sign(ox), ox)
    oy2 = np.where(fold, (1 - np.abs(ox)) * np.sign(oy), oy)
    bx = np.clip(((ox2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    by = np.clip(((oy2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    octant = (bx * 8 + by) * 2 + fold.astype(np.int32)
    perm = np.argsort(cluster * 128 + octant, kind="stable")
    o_s = jnp.asarray(o2[perm])
    d_s = jnp.asarray(d[perm])
    R = o_s.shape[0]

    # trace_closest_bvh_full is module-jitted: the ROWSKIP flag is baked
    # in at first trace, so each config needs its own PROCESS. Run as
    #   PT_ROWSKIP=1 python scripts/bench_rowskip.py
    #   PT_ROWSKIP=0 python scripts/bench_rowskip.py
    # Measured v5e (2026-08-20): rowskip 49.9 ms vs baseline 29.4 ms —
    # negative result, see trace_bvh.ROWSKIP.
    label = "rowskip" if trace_bvh.ROWSKIP else "baseline"
    fn = jax.jit(
        lambda o_, d_: trace_bvh.trace_closest_bvh_full(
            packed40, bounds, meta, o_, d_, 0.0, jnp.inf, tile=128,
            packed=True,
        )
    )
    out = jax.block_until_ready(fn(o_s, d_s))
    ops = profile_device_ops(
        lambda: fn(o_s, d_s), lambda x: float(x[0, 0]), top_n=4
    )
    tot = sum(m for _, m in ops)
    print(
        f"bounce-closest tile=128 {label:9s} device {tot:7.2f} ms "
        f"{R / tot * 1e-3:6.2f} Mrays/s"
    )
    a = np.asarray(out)
    print(f"hits: {int((a[:, 1] >= 0).sum())} of {R}")


if __name__ == "__main__":
    main()
