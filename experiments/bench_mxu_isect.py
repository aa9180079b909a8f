#!/usr/bin/env python
"""Ray-triangle block intersection: VPU Moller vs MXU Plucker.

The in-situ isolation (scripts/bench_insitu.py) shows ~2.0 us of the
2.59 us leaf visit is _moller_block: (256 rays x 128 tris) pairwise
Moller-Trumbore is ~45 VPU ops over 32 vregs. The Plucker formulation
moves the O(R*T) pairwise work onto the MXU:

    side_e(ray, tri) = d . (PxQ) + (oxd) . (Q-P)      per edge e
                     = [d | m] @ [g_e | u_e]^T         (R,6)@(6,T) matmul
    t = (n.v0 - n.o) / (n.d)                           two (R,3)@(3,T)

hit = all three sides same sign & t in (t_min, t_max); u,v fall out of
the normalized side values. Epilogue is ~12 VPU ops.

This bench loops each block NV times over a fixed VMEM slab and reports
us/iteration; parity is asserted against the Moller block first.
Serial TPU use.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from prosper_tpu.scene.caches import enable_compile_cache
    from prosper_tpu.ops.trace_pallas import _moller_block
    from prosper_tpu.ops.trace_plucker import (
        _plucker_block, plucker_rows_from_slab, PLU_ROWS,
    )

    enable_compile_cache()

    TILE = 256
    NV = 2000

    rng = np.random.default_rng(0)
    # triangles in a unit box; rays shooting through it
    v0 = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    e1 = rng.uniform(-0.6, 0.6, (128, 3)).astype(np.float32)
    e2 = rng.uniform(-0.6, 0.6, (128, 3)).astype(np.float32)
    slab = np.concatenate([v0.T, e1.T, e2.T], axis=0)  # (9, 128)

    o = rng.uniform(-3, 3, (TILE, 3)).astype(np.float32)
    d = rng.normal(size=(TILE, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    ox, oy, oz = (jnp.asarray(o[:, i:i + 1]) for i in range(3))
    dx, dy, dz = (jnp.asarray(d[:, i:i + 1]) for i in range(3))
    slab_d = jnp.asarray(slab)

    # ---- parity check (interpretable on CPU too, here on device) ----
    def check():
        h0, t0, u0, v0_ = _moller_block(
            slab_d, ox, oy, oz, dx, dy, dz, 1e-4, jnp.inf
        )
        rows = plucker_rows_from_slab(slab_d)
        h1, t1, u1, v1_ = _plucker_block(
            rows, ox, oy, oz, dx, dy, dz, 1e-4, jnp.inf
        )
        h0, t0, u0, v0n = map(np.asarray, (h0, t0, u0, v0_))
        h1, t1, u1, v1n = map(np.asarray, (h1, t1, u1, v1_))
        agree = h0 == h1
        print(
            f"hit agreement: {agree.mean()*100:.3f}%  "
            f"(moller {h0.sum()} hits, plucker {h1.sum()})"
        )
        both = h0 & h1
        if both.any():
            terr = np.abs(t0[both] - t1[both]) / np.maximum(t0[both], 1e-6)
            uerr = np.abs(u0[both] - u1[both])
            verr = np.abs(v0n[both] - v1n[both])
            print(
                f"t rel err max {terr.max():.2e}  u err max {uerr.max():.2e}"
                f"  v err max {verr.max():.2e}"
            )
        assert agree.mean() > 0.9995, "plucker disagrees with moller"

    check()

    # ---- looped block cost ----
    def loop_kernel(variant):
        def kernel(cols_ref, slab_ref, out_ref):
            colsT = jnp.transpose(cols_ref[0], (1, 0))
            ox = colsT[:, 0:1]
            oy = colsT[:, 1:2]
            oz = colsT[:, 2:3]
            dx = colsT[:, 3:4]
            dy = colsT[:, 4:5]
            dz = colsT[:, 5:6]
            if variant == "plucker":
                rows = plucker_rows_from_slab(slab_ref[...])
            elif variant == "plucker_pre":
                rows = slab_ref[...]  # already packed

            def body(state):
                i, best = state
                if variant == "moller":
                    hit, t, u, v = _moller_block(
                        slab_ref[...], ox, oy, oz, dx, dy, dz, 1e-4, best
                    )
                else:
                    hit, t, u, v = _plucker_block(
                        rows, ox, oy, oz, dx, dy, dz, 1e-4, best
                    )
                tmin = jnp.min(t, axis=1, keepdims=True)
                # keep the dependence chain honest without shrinking best
                best = jnp.where(tmin < -1.0, tmin, best)
                return i + 1, best

            _, best = jax.lax.while_loop(
                lambda s: s[0] < NV, body, (0, jnp.full((TILE, 1), jnp.inf))
            )
            out_ref[...] = jnp.broadcast_to(best, (TILE, 128))

        return kernel

    def run(variant):
        slab_in = (
            np.asarray(plucker_rows_from_slab(slab_d))
            if variant == "plucker_pre"
            else slab
        )
        nrows = slab_in.shape[0]
        f = pl.pallas_call(
            loop_kernel(variant),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TILE, 128), jnp.float32),
        )
        cols = jnp.asarray(
            np.stack([o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]])
        )[None]  # (1, 6, TILE)
        x = jax.jit(f)(cols, jnp.asarray(slab_in))
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            jax.block_until_ready(jax.jit(f)(cols, jnp.asarray(slab_in)))
        dt = (time.perf_counter() - t0) / reps
        print(f"{variant:12s}: {dt*1e3:8.2f} ms  ({dt/NV*1e6:6.3f} us/visit)")

    for variant in ("moller", "plucker", "plucker_pre"):
        run(variant)


if __name__ == "__main__":
    main()
