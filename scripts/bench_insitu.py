#!/usr/bin/env python
"""In-situ BVH kernel cost isolation on a controlled no-hit scene.

A line of C clusters whose AABBs all straddle the ray corridor; rays fly
+x through every cluster, triangles are far outside the corridor so
Moller never hits and per-ray bounds never shrink -> traversal is
IDENTICAL (visit all C leaves front-to-back) across three kernel modes:

  full      descent + DMA + Moller + update chain
  nomoller  descent + DMA + update chain     (DEBUG_NO_MOLLER)
  nodma     descent + update chain           (DEBUG_NO_DMA)

The differences give the true in-situ Moller and DMA shares; the nodma
time is the descent+update floor. Serial TPU use.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from prosper_tpu.accel.bvh import build_bvh, pack_nodes
    from prosper_tpu.ops import trace, trace_bvh
    from prosper_tpu.ops.trace_pallas import pack_tris

    pad = trace.CLUSTER_PAD
    R = 2048  # 8 tiles = 1 grid step

    rng = np.random.default_rng(0)
    o = np.stack(
        [
            np.full(R, -1.0, np.float32),
            rng.uniform(-0.5, 0.5, R).astype(np.float32),
            rng.uniform(-0.5, 0.5, R).astype(np.float32),
        ],
        axis=1,
    )
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (R, 1))

    for C in (64, 256, 768):
        S = C * pad
        v0 = np.tile(np.array([[0.0, 1e4, 0.0]], np.float32), (S, 1))
        tris = {
            "v0": v0,
            "e1": np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (S, 1)),
            "e2": np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (S, 1)),
        }
        xs = np.arange(C, dtype=np.float32)
        wc_min = np.stack([xs, np.full(C, -1.0), np.full(C, -1.0)], 1)
        wc_max = np.stack([xs + 0.5, np.ones(C), np.ones(C)], 1)
        bounds, meta = pack_nodes(build_bvh(wc_min, wc_max, max_leaf_size=1))
        packed = jax.block_until_ready(pack_tris(tris))
        o_d, d_d = jnp.asarray(o), jnp.asarray(d)
        bounds_d, meta_d = jnp.asarray(bounds), jnp.asarray(meta)

        def run():
            h = trace_bvh.trace_closest_bvh(
                packed, bounds_d, meta_d, o_d, d_d, 0.0, jnp.inf
            )
            return float(jnp.sum(h["t"] * 0 + h["tri"]))

        from prosper_tpu.utils.profiler import profile_device_ops

        results = {}
        for mode in ("full", "nomoller", "nodma", "fakeenter"):
            trace_bvh.DEBUG_NO_MOLLER = mode == "nomoller"
            trace_bvh.DEBUG_NO_DMA = mode in ("nodma", "fakeenter")
            trace_bvh.DEBUG_FAKE_ENTER = mode == "fakeenter"
            jax.clear_caches()
            run()
            ops = profile_device_ops(
                lambda: trace_bvh.trace_closest_bvh(
                    packed, bounds_d, meta_d, o_d, d_d, 0.0, jnp.inf
                ),
                lambda h: float(h["t"][0]),
                top_n=3,
            )
            results[mode] = max(m for _, m in ops) / 1e3
        trace_bvh.DEBUG_NO_MOLLER = False
        trace_bvh.DEBUG_NO_DMA = False
        trace_bvh.DEBUG_FAKE_ENTER = False
        jax.clear_caches()

        n_tiles = R // trace.TILE
        visits = n_tiles * C
        line = f"C={C:4d} visits={visits:6d}  "
        for mode, dt in results.items():
            line += f"{mode}: {dt*1e3:7.2f} ms ({dt/visits*1e6:5.2f} us/v)  "
        print(line)


if __name__ == "__main__":
    main()
