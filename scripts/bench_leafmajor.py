#!/usr/bin/env python
"""Leaf-major vs packet tracing on the REAL bounce/shadow ray sets.

Builds the FlightHelmet primary hits, derives cosine-hemisphere bounce
rays + directional-light shadow rays (the PT frame's incoherent
classes), and times packet-BVH vs leaf-major kernels on the device.
Serial TPU use.
"""

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

    from prosper_tpu.ops import trace, trace_bvh, trace_leafmajor
    from prosper_tpu.ops.rays import pinhole_rays
    from prosper_tpu.ops.trace_pallas import pack_tris
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
    wc_min = frame_dev["wc_aabb_min_w"]
    wc_max = frame_dev["wc_aabb_max_w"]
    packed40 = jax.block_until_ready(pack_tris_full(static, frame_dev))
    tris = trace.world_triangles(static, frame_dev)
    packed9 = jax.block_until_ready(pack_tris(tris))

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
    hit = jax.block_until_ready(
        trace_bvh.trace_closest_bvh_full(
            packed40, bounds, meta, ray_o, ray_d, 0.0, jnp.inf
        )
    )

    t = np.asarray(hit["t"])
    tri = np.asarray(hit["tri"])
    n = np.asarray(hit["normal"])
    o = np.asarray(ray_o) + t[:, None] * np.asarray(ray_d)
    idx = np.nonzero(tri >= 0)[0]
    print(f"live rays: {idx.size}")
    rng = np.random.default_rng(0)
    nrm = n[idx] / np.maximum(
        np.linalg.norm(n[idx], axis=1, keepdims=True), 1e-9
    )
    u1, u2 = rng.random(idx.size), rng.random(idx.size)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    tang = np.cross(
        nrm, np.where(np.abs(nrm[:, :1]) < 0.9, [[1.0, 0, 0]], [[0, 1.0, 0]])
    )
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-9)
    bit = np.cross(nrm, tang)
    d_b = (
        tang * (r * np.cos(phi))[:, None]
        + bit * (r * np.sin(phi))[:, None]
        + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None]
    ).astype(np.float32)
    o_b = (o[idx] + 1e-4 * nrm).astype(np.float32)
    cluster = tri[idx] // trace.CLUSTER_PAD

    # shadow rays: directional light (the default scene's NEE target)
    d_s = np.tile(np.array([[0.3, 0.8, 0.4]], np.float32), (idx.size, 1))
    d_s /= np.linalg.norm(d_s, axis=1, keepdims=True)

    # packet kernels want the coherence sort; leaf-major takes raw order
    ad = np.abs(d_b)
    denom = np.maximum(ad.sum(1), 1e-20)
    ox, oy = d_b[:, 0] / denom, d_b[:, 1] / denom
    fold = d_b[:, 2] < 0
    ox2 = np.where(fold, (1 - np.abs(oy)) * np.sign(ox), ox)
    oy2 = np.where(fold, (1 - np.abs(ox)) * np.sign(oy), oy)
    bx = np.clip(((ox2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    by = np.clip(((oy2 * 0.5 + 0.5) * 8).astype(np.int32), 0, 7)
    octant = (bx * 8 + by) * 2 + fold.astype(np.int32)
    order = np.argsort(cluster * 128 + octant, kind="stable")

    sets = {
        "bounce-closest": (o_b, d_b, order, False),
        "shadow-any": (o_b, d_s, np.argsort(cluster, kind="stable"), True),
    }
    for name, (o_r, d_r, perm, is_any) in sets.items():
        o_sorted = jnp.asarray(o_r[perm])
        d_sorted = jnp.asarray(d_r[perm])
        o_raw = jnp.asarray(o_r)
        d_raw = jnp.asarray(d_r)
        R = o_r.shape[0]

        if is_any:
            pk = lambda: trace_bvh.trace_any_bvh(  # noqa: E731
                packed9, bounds, meta, o_sorted, d_sorted, 0.1, 100.0
            )
            lm = lambda: trace_leafmajor.trace_any_leafmajor(  # noqa: E731
                packed9, wc_min, wc_max, o_raw, d_raw, 0.1, 100.0
            )[0]
            hy = lambda: trace_leafmajor.trace_any_hybrid(  # noqa: E731
                packed9, bounds, meta, wc_min, wc_max,
                o_sorted, d_sorted, 0.1, 100.0,
            )[0]
            force_pk = lambda x: bool(x[0])  # noqa: E731
            force_lm = lambda x: bool(x[0])  # noqa: E731
        else:
            pk = lambda: trace_bvh.trace_closest_bvh_full(  # noqa: E731
                packed40, bounds, meta, o_sorted, d_sorted, 0.0, jnp.inf
            )
            lm = lambda: trace_leafmajor.trace_closest_leafmajor_full(  # noqa: E731
                packed40, wc_min, wc_max, o_raw, d_raw, 1e-4, jnp.inf
            )
            hy = lambda: trace_leafmajor.trace_closest_leafmajor_full_safe(  # noqa: E731
                packed40, bounds, meta, wc_min, wc_max,
                o_sorted, d_sorted, 1e-4, jnp.inf,
            )
            force_pk = lambda h: float(h["t"][0])  # noqa: E731
            force_lm = force_pk

        for kname, fn, force in (
            ("packet(sorted)", pk, force_pk),
            ("leafmajor", lm, force_lm),
            ("hybrid(sorted)", hy, force_lm),
        ):
            ops = profile_device_ops(fn, force, top_n=6)
            tot = sum(m for _, m in ops)
            top = max(m for _, m in ops)
            print(
                f"{name:16s} {kname:16s} device total {tot:7.2f} ms "
                f"(top op {top:6.2f})  {R / tot * 1e-3:6.2f} Mrays/s"
            )


if __name__ == "__main__":
    main()
