#!/usr/bin/env python
"""A/B the 8-wide descent kernels vs the BVH2 kernels on real bounce
rays (same harness as bench_bounce.py). Serial TPU use."""

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
    nodes8 = frame_dev["bvh_nodes8"]
    print(f"nodes8: {nodes8.shape}")
    packed40 = jax.block_until_ready(pack_tris_full(static, frame_dev))
    packed9 = jax.block_until_ready(packed40[:, :9] + 0.0)

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

    # primary timing A/B
    for name, fn in [
        ("bvh2", lambda: trace_bvh.trace_closest_bvh_full(
            packed40, bounds, meta, ray_o, ray_d, 0.0, jnp.inf)),
        ("bvh8", lambda: trace_bvh.trace_closest_bvh8_full(
            packed40, nodes8, ray_o, ray_d, 0.0, jnp.inf)),
    ]:
        ops = profile_device_ops(fn, lambda h: float(h["t"][0]), top_n=2)
        tot = max(m for _, m in ops)
        print(f"primary closest {name}: {tot:7.2f} ms")

    hit = trace_bvh.trace_closest_bvh_full(
        packed40, bounds, meta, ray_o, ray_d, 0.0, jnp.inf
    )
    hit = jax.block_until_ready(hit)
    hit8 = jax.block_until_ready(trace_bvh.trace_closest_bvh8_full(
        packed40, nodes8, ray_o, ray_d, 0.0, jnp.inf))
    mismatch = int((np.asarray(hit["tri"]) != np.asarray(hit8["tri"])).sum())
    print(f"primary tri mismatches bvh2 vs bvh8: {mismatch}")

    t = np.asarray(hit["t"])
    tri = np.asarray(hit["tri"])
    n = np.asarray(hit["normal"])
    o = np.asarray(ray_o) + t[:, None] * np.asarray(ray_d)
    live = tri >= 0
    idx = np.nonzero(live)[0]
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
    print(f"live bounce rays: {idx.size} (padded {R})")

    ad = np.abs(d2)
    denom = np.maximum(ad.sum(1), 1e-20)
    ox, oy = d2[:, 0] / denom, d2[:, 1] / denom
    fold = d2[:, 2] < 0
    ox2 = np.where(fold, (1 - np.abs(oy)) * np.sign(ox), ox)
    oy2 = np.where(fold, (1 - np.abs(ox)) * np.sign(oy), oy)
    bx = np.clip(((ox2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    by = np.clip(((oy2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    oct_ = (bx * 8 + by) * 2 + fold.astype(np.int32)
    perm = np.argsort(cl * 128 + oct_, kind="stable")

    o_s = jnp.asarray(o2[perm])
    d_s = jnp.asarray(d2[perm])
    tm = jnp.asarray(tmax[perm])
    tm_any = jnp.asarray(np.where(tmax[perm] > 1, 8.0, 0.0).astype(np.float32))

    for name, fn in [
        ("bvh2", lambda: trace_bvh.trace_closest_bvh_full(
            packed40, bounds, meta, o_s, d_s, 0.0, tm)),
        ("bvh8", lambda: trace_bvh.trace_closest_bvh8_full(
            packed40, nodes8, o_s, d_s, 0.0, tm)),
    ]:
        ops = profile_device_ops(fn, lambda h: float(h["t"][0]), top_n=2)
        tot = max(m for _, m in ops)
        print(f"bounce closest {name}: {tot:7.2f} ms "
              f"({idx.size/tot/1e3:6.1f} M live rays/s)")

    for name, fn in [
        ("bvh2", lambda: trace_bvh.trace_any_bvh(
            packed9, bounds, meta, o_s, d_s, 0.0, tm_any)),
        ("bvh8", lambda: trace_bvh.trace_any_bvh8(
            packed9, nodes8, o_s, d_s, 0.0, tm_any)),
    ]:
        ops = profile_device_ops(fn, lambda h: bool(h[0]), top_n=2)
        tot = max(m for _, m in ops)
        print(f"bounce any     {name}: {tot:7.2f} ms")


if __name__ == "__main__":
    main()
