#!/usr/bin/env python
"""Break the bounce-trace leaf-visit cost into descent vs Moller parts.

Runs the plain closest kernel on real bounce rays three ways:
  1. DEBUG_VISITS: per-tile leaf-visit counts (union divergence measure)
  2. stock kernel timing
  3. NOP-Moller kernel timing (descent + DMA only; monkeypatched)
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

    # --- 1. visit counts ---
    trace_bvh.DEBUG_VISITS = True
    trace_bvh.trace_closest_bvh._clear_cache()
    out = trace_bvh.trace_closest_bvh(
        packed9, bounds, meta, o_s, d_s, 0.0, tm
    )
    raw = jax.block_until_ready(out)
    # row 7 pad carries per-tile visit counts (same for all rays of a tile)
    # recover via the packed row: re-run raw to fetch. DEBUG writes to
    # out[:, 7] which trace_closest_bvh discards; grab via its internals.
    trace_bvh.DEBUG_VISITS = False
    trace_bvh.trace_closest_bvh._clear_cache()

    # recompute visits through the private path to read row 7
    R2, R_out, n_steps, cols, rowdata = trace_bvh._prep_bvh(o_s, d_s, tm)
    import jax.experimental.pallas as pl

    trace_bvh.DEBUG_VISITS = True
    grid_spec = trace_bvh.pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=trace_bvh._in_specs(),
        out_specs=[trace_bvh._out_block(8)],
        scratch_shapes=[
            trace_bvh.pltpu.VMEM((2, trace_bvh.ROWS_PLAIN, 128), jnp.float32),
            trace_bvh.pltpu.SMEM((1, trace_bvh.STACK_CAP), jnp.int32),
            trace_bvh.pltpu.SMEM((1, trace_bvh.STACK_CAP), jnp.float32),
            trace_bvh.pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    n_tiles = n_steps * trace_bvh.TILES_PER_STEP
    (outp,) = pl.pallas_call(
        trace_bvh._closest_body(fused=False),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 8, trace_bvh.TILE), jnp.float32)],
    )(bounds.reshape(1, -1), meta.reshape(1, -1), cols, rowdata, packed9)
    visits = np.asarray(outp[:, 7, 0])
    trace_bvh.DEBUG_VISITS = False
    live_tiles = visits > 0
    print(f"tiles: {n_tiles}, live: {live_tiles.sum()}")
    print(
        f"leaf visits/tile: mean {visits[live_tiles].mean():.1f} "
        f"max {visits.max():.0f} total {visits.sum():.0f}"
    )

    # --- 2. stock timing (plain kernel) ---
    fn = lambda: trace_bvh.trace_closest_bvh(
        packed9, bounds, meta, o_s, d_s, 0.0, tm
    )
    ops = profile_device_ops(fn, lambda h: float(h["t"][0]), top_n=2)
    ms_full = max(m for _, m in ops)
    print(f"plain closest (descent+moller): {ms_full:7.2f} ms "
          f"({visits.sum() and ms_full * 1e3 / visits.sum():.2f} us/visit)")

    # --- 3. standalone Moller unit cost: K sequential (TILE,128) blocks
    # with loop-carried best (mimics the kernel's dependency chain) ---
    from prosper_tpu.ops.trace_pallas import _moller_block
    from jax.experimental.pallas import tpu as pltpu

    K = 1024
    TILE = trace_bvh.TILE

    def moller_loop_kernel(slab_ref, rays_ref, out_ref):
        colsT = jnp.transpose(rays_ref[0], (1, 0))
        ox, oy, oz = colsT[:, 0:1], colsT[:, 1:2], colsT[:, 2:3]
        dx, dy, dz = colsT[:, 3:4], colsT[:, 4:5], colsT[:, 5:6]

        def body(i, best):
            hit, t, u, v = _moller_block(
                slab_ref[0], ox, oy, oz, dx, dy, dz, 1e-4, best
            )
            tmin = jnp.min(t, axis=1, keepdims=True)
            return jnp.minimum(best, tmin + 1e-7)

        best = jax.lax.fori_loop(
            0, K, body, jnp.full((TILE, 1), trace_bvh._INF, jnp.float32)
        )
        out_ref[0] = jnp.transpose(best, (1, 0))

    slab = packed9[0:1]
    rays = cols[0:1, :, :TILE]
    ml = pl.pallas_call(
        moller_loop_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1, TILE), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fn = lambda: ml(slab, rays)
    ops = profile_device_ops(fn, lambda h: float(h[0, 0, 0]), top_n=2)
    ms_m = max(m for _, m in ops)
    print(f"moller unit: {ms_m * 1e3 / K:.3f} us per (TILE,128) block "
          f"-> est moller share {ms_m * 1e3 / K * visits.sum() / 1e3:.2f} ms")


if __name__ == "__main__":
    main()
