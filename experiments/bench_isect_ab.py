#!/usr/bin/env python
"""In-situ A/B of the leaf triangle test: Möller (VPU) vs Plücker (MXU).

Runs the REAL BVH closest-hit kernel (ops/trace_bvh.py) on a stress
scene with divergent rays, switching `trace_bvh.ISECT_BLOCK`, and
reports device kernel time + hit parity between blocks. This is the
honest version of scripts/bench_mxu_isect.py (whose isolated microbench
disagreed with in-situ visit costs by ~10x). Serial TPU use.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from prosper_tpu.ops import trace_bvh
    from prosper_tpu.ops.trace_pallas import pack_tris
    from prosper_tpu.testing import make_stress_scene
    from prosper_tpu.utils.profiler import profile_device_ops

    R = 256 * 1024
    rng = np.random.default_rng(1)

    tris, wc_min, wc_max, bounds, meta = make_stress_scene(1024)
    packed = jax.block_until_ready(pack_tris(tris))
    lo, hi = wc_min.min(axis=0), wc_max.max(axis=0)
    o = rng.uniform(lo - 1, hi + 1, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_d, d_d = jnp.asarray(o), jnp.asarray(d)
    bounds_d, meta_d = jnp.asarray(bounds), jnp.asarray(meta)

    def run():
        return trace_bvh.trace_closest_bvh(
            packed, bounds_d, meta_d, o_d, d_d, 0.0, jnp.inf
        )

    results = {}
    hits = {}
    modes = [
        ("moller", None),
        ("plucker-bf16", None),
        ("plucker-f32", jax.lax.Precision.HIGHEST),
    ]
    for name, prec in modes:
        trace_bvh.ISECT_BLOCK = "plucker" if "plucker" in name else "moller"
        trace_bvh.ISECT_PRECISION = prec
        jax.clear_caches()
        h = jax.block_until_ready(run())
        hits[name] = {k: np.asarray(v) for k, v in h.items()}
        ops = profile_device_ops(run, lambda h: float(h["t"][0]), top_n=3)
        results[name] = max(m for _, m in ops)
    trace_bvh.ISECT_BLOCK = "moller"
    trace_bvh.ISECT_PRECISION = None
    jax.clear_caches()

    base = hits["moller"]
    n_hit = (base["tri"] >= 0).sum()
    print(f"rays={R}  hits={n_hit} ({100.0 * n_hit / R:.1f}%)")
    for name, _ in modes:
        ms = results[name]
        h = hits[name]
        same_tri = (h["tri"] == base["tri"]).mean()
        both = (h["tri"] >= 0) & (base["tri"] >= 0)
        dt = np.abs(h["t"][both] - base["t"][both])
        print(
            f"{name:14s} {ms:8.2f} ms  tri-agree {same_tri * 100:.3f}%  "
            f"t err max {dt.max():.2e} mean {dt.mean():.2e}"
        )


if __name__ == "__main__":
    main()
