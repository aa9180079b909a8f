#!/usr/bin/env python
"""Dense-cull descent vs packet stack descent on the REAL bounce/shadow
ray sets (same harness as bench_leafmajor.py). Serial TPU use.

The dense kernel replaces the per-packet BVH2 stack walk (~180 pops,
each a scalar-sync'd node test chain) with one vectorized
all-rays x all-clusters slab pass + front-to-back argmin pops
(ops/trace_bvh._make_descent_dense).
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

    from prosper_tpu.ops import trace, trace_bvh
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
    print(f"live rays: {idx.size}, clusters: {packed9.shape[0]}")
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

    d_s = np.tile(np.array([[0.3, 0.8, 0.4]], np.float32), (idx.size, 1))
    d_s /= np.linalg.norm(d_s, axis=1, keepdims=True)

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
        R = o_r.shape[0]

        variants = []
        if is_any:
            variants.append((
                "packet(sorted,128)",
                lambda: trace_bvh.trace_any_bvh(
                    packed9, bounds, meta, o_sorted, d_sorted, 0.1, 100.0,
                    tile=128,
                ),
            ))
            for tl in (128, 256):
                variants.append((
                    f"dense(sorted,{tl})",
                    lambda tl=tl: trace_bvh.trace_any_bvh_dense(
                        packed9, bounds, meta, o_sorted, d_sorted,
                        0.1, 100.0, tile=tl,
                    ),
                ))
            force = lambda x: bool(x[0])  # noqa: E731
        else:
            variants.append((
                "packet(sorted,128)",
                lambda: trace_bvh.trace_closest_bvh(
                    packed40, bounds, meta, o_sorted, d_sorted, 0.0,
                    jnp.inf, tile=128,
                ),
            ))
            for tl in (128, 256):
                variants.append((
                    f"dense(sorted,{tl})",
                    lambda tl=tl: trace_bvh.trace_closest_bvh_dense(
                        packed40, bounds, meta, o_sorted, d_sorted, 0.0,
                        jnp.inf, tile=tl,
                    ),
                ))
            force = lambda h: float(h["t"][0])  # noqa: E731

        ref = None
        for kname, fn in variants:
            got = jax.block_until_ready(fn())
            if is_any:
                v = np.asarray(got)
            else:
                v = np.stack(
                    [np.asarray(got["t"]), np.asarray(got["tri"])], -1
                )
            if ref is None:
                ref = v
            else:
                ok = (
                    np.array_equal(ref, v)
                    if is_any
                    else np.allclose(ref, v, rtol=1e-5, atol=1e-5, equal_nan=True)
                )
                if not ok:
                    nbad = int((ref != v).sum())
                    print(f"  PARITY MISMATCH {kname}: {nbad} differing")
            ops = profile_device_ops(fn, force, top_n=6)
            tot = sum(m for _, m in ops)
            top = max(m for _, m in ops)
            print(
                f"{name:16s} {kname:20s} device total {tot:7.2f} ms "
                f"(top op {top:6.2f})  {R / tot * 1e-3:6.2f} Mrays/s"
            )


if __name__ == "__main__":
    main()
