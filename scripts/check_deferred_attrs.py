#!/usr/bin/env python
"""Parity check: plain kernel + attrs_from_hit_rows vs the fused
full kernel on a real bounce-like ray set (device)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet.gltf"


def main():
    import jax
    import jax.numpy as jnp

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()

    from prosper_tpu.ops import trace
    from prosper_tpu.ops.trace_bvh import (
        attr_rows_from_packed,
        attrs_from_hit_rows,
        trace_closest_bvh,
        trace_closest_bvh_full,
        unpack_hit8,
    )
    from prosper_tpu.ops.trace_pallas_full import pack_tris_full
    from prosper_tpu.scene.world import World

    world = World(SCENE)
    frame = world.frame_arrays(0.0)
    static = {
        k: jnp.asarray(v)
        for k, v in world.static_scene_arrays().items()
        if k != "materials"
    }
    fd = {
        k: jnp.asarray(v)
        for k, v in frame.items()
        if k not in ("scene_camera", "bvh_depth", "lights")
    }
    bounds, meta = fd["bvh_bounds"], fd["bvh_meta"]
    packed_full = jax.block_until_ready(pack_tris_full(static, fd))
    attr_rows = attr_rows_from_packed(packed_full)

    # random hemisphere-ish rays from inside the scene AABB
    rng = np.random.default_rng(7)
    lo = np.asarray(fd["wc_aabb_min_w"]).min(axis=0)
    hi = np.asarray(fd["wc_aabb_max_w"]).max(axis=0)
    R = 8192
    o = rng.uniform(lo, hi, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((R,), np.inf, jnp.float32)

    full = jax.jit(
        lambda o, d, t: trace_closest_bvh_full(
            packed_full, bounds, meta, o, d, 0.0, t, tile=128
        )
    )(o_j, d_j, tmax)
    h8 = jax.jit(
        lambda o, d, t: trace_closest_bvh(
            packed_full, bounds, meta, o, d, 0.0, t, tile=128, packed=True
        )
    )(o_j, d_j, tmax)
    plain = attrs_from_hit_rows(attr_rows, unpack_hit8(h8))

    ok = True
    for k in ("t", "tri", "normal", "tangent", "uv", "material", "tri_lod"):
        a = np.asarray(full[k], np.float32)
        b = np.asarray(plain[k], np.float32)
        a = np.where(np.isinf(a), 3e38, a)  # inf - inf on matched misses
        b = np.where(np.isinf(b), 3e38, b)
        d_ = np.max(np.abs(a - b)) if a.size else 0.0
        n_bad = int(np.sum(np.any(np.atleast_2d((np.abs(a - b) > 1e-5).T), axis=0)))
        print(f"{k:9s} max|diff| {d_:.3e}  rows off {n_bad}")
        if d_ > 1e-4:
            ok = False
    hits = int(np.sum(np.asarray(full["tri"]) >= 0))
    print(f"hits {hits}/{R}")
    print("PARITY OK" if ok else "PARITY FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
