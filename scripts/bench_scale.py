#!/usr/bin/env python
"""Scale proof: BVH trace device cost must grow ~log, not linear, in
cluster count (VERDICT round-1 item 8). 512^2 primary-like rays through
stress scenes of growing cluster count; device ms from the xplane."""

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

    from prosper_tpu.ops import trace_bvh, trace_pallas
    from prosper_tpu.testing import make_stress_scene
    from scripts.xprof import dump_trace, top_ops  # noqa
    from jax.profiler import ProfileData
    import glob
    from collections import defaultdict

    R = 512 * 512
    rng = np.random.default_rng(1)

    def device_ms(fn, force):
        outdir = dump_trace(fn, force, outdir="/tmp/xscale")
        paths = glob.glob(os.path.join("/tmp/xscale", "**", "*.xplane.pb"),
                          recursive=True)
        data = ProfileData.from_file(paths[0])
        total = 0.0
        for plane in data.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            for line in plane.lines:
                ln = line.name.lower()
                if "step" in ln or "xla modules" in ln:
                    continue
                for ev in line.events:
                    if "custom-call" in ev.name or "trace_closest" in ev.name:
                        total += ev.duration_ns / 1e6
        return total / 2  # two traced iterations

    for n_c in (256, 512, 1024, 2048, 4096):
        tris, wc_min, wc_max, bounds, meta = make_stress_scene(n_c)
        packed = jax.block_until_ready(
            trace_pallas.pack_tris({k: jnp.asarray(v) for k, v in tris.items()})
        )
        bounds_d, meta_d = jnp.asarray(bounds), jnp.asarray(meta)
        extent = wc_max.max(axis=0) - wc_min.min(axis=0)
        center = (wc_max.max(axis=0) + wc_min.min(axis=0)) / 2
        eye = center + extent * 1.2
        o = np.tile(eye[None, :], (R, 1)).astype(np.float32)
        targets = rng.uniform(wc_min.min(axis=0), wc_max.max(axis=0), (R, 3))
        d = targets - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o_d, d_d = jnp.asarray(o), jnp.asarray(d.astype(np.float32))

        fn = lambda: trace_bvh.trace_closest_bvh(
            packed, bounds_d, meta_d, o_d, d_d, 0.0, jnp.inf
        )
        h = fn()
        hr = float((h["tri"] >= 0).mean())
        ms = device_ms(fn, lambda x: float(x["t"].min()))
        print(
            f"clusters {n_c:5d} ({n_c*128/1000:.0f}k tris): "
            f"{ms:7.2f} ms device, hitrate {hr:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
