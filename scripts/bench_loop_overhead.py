#!/usr/bin/env python
"""Isolate Mosaic control-flow fixed costs that bound the BVH kernel's
~2.1 us/visit non-Moller overhead:

  1. flat while_loop: N iterations of (SMEM load + add)
  2. nested: outer while_loop of M iterations, each ENTERING an inner
     while_loop that runs K iterations (the find_leaf-inside-pipeline
     structure) -> measures per-entry setup cost of a nested loop
  3. flat + lax.cond per iteration
  4. flat + 2x (2,128) vector op per iteration (expand-like)

Serial TPU use.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from prosper_tpu.scene.caches import enable_compile_cache

    enable_compile_cache()

    N = 200_000

    def timed(name, fn, *args):
        r = jax.jit(fn)(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            r = jax.jit(fn)(*args)
            jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:28s}: {dt*1e3:8.2f} ms  ({dt/N*1e9:7.1f} ns/iter)")
        return r

    # 1. flat scalar loop
    def flat_kernel(s_ref, out_ref, acc_ref):
        def body(c):
            i, a = c
            return i + 1, a + s_ref[0, jax.lax.rem(i, 128)]

        _, a = jax.lax.while_loop(lambda c: c[0] < N, body, (0, jnp.int32(0)))
        acc_ref[0, 0] = a
        out_ref[...] = jnp.full((8, 128), a, jnp.int32)

    def run_flat(s):
        return pl.pallas_call(
            flat_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        )(s)

    # 2. nested: outer M entries, inner K iterations (M*K = N)
    K = 4
    M = N // K

    def nested_kernel(s_ref, out_ref, acc_ref):
        def inner(j0, a0):
            def ib(c):
                j, a = c
                return j + 1, a + s_ref[0, jax.lax.rem(j, 128)]

            return jax.lax.while_loop(lambda c: c[0] < j0 + K, ib, (j0, a0))

        def body(c):
            i, a = c
            _, a = inner(i * K, a)
            return i + 1, a

        _, a = jax.lax.while_loop(lambda c: c[0] < M, body, (0, jnp.int32(0)))
        acc_ref[0, 0] = a
        out_ref[...] = jnp.full((8, 128), a, jnp.int32)

    def run_nested(s):
        return pl.pallas_call(
            nested_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        )(s)

    # 3. flat + cond
    def cond_kernel(s_ref, out_ref, acc_ref):
        def body(c):
            i, a = c
            a = jax.lax.cond(
                (i & 3) == 0,
                lambda x: x + s_ref[0, jax.lax.rem(i, 128)],
                lambda x: x + 1,
                a,
            )
            return i + 1, a

        _, a = jax.lax.while_loop(lambda c: c[0] < N, body, (0, jnp.int32(0)))
        acc_ref[0, 0] = a
        out_ref[...] = jnp.full((8, 128), a, jnp.int32)

    def run_cond(s):
        return pl.pallas_call(
            cond_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        )(s)

    # 4. flat + vector work per iteration (node-test-like): two (2,128)
    # fma chains + a scalar reduce
    NV = 20_000

    def vec_kernel(s_ref, v_ref, out_ref, acc_ref):
        rows = v_ref[...]

        def body(c):
            i, a = c
            t0 = (rows[0:2] - a) * rows[2:4]
            t1 = (rows[4:6] - a) * rows[6:8]
            e = jnp.minimum(t0, t1)
            a = a + jnp.min(e)
            return i + 1, a

        _, a = jax.lax.while_loop(
            lambda c: c[0] < NV, body, (0, jnp.float32(0))
        )
        acc_ref[0, 0] = a
        out_ref[...] = jnp.full((8, 128), a, jnp.float32)

    def run_vec(v):
        return pl.pallas_call(
            vec_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        )(jnp.zeros((1, 1), jnp.int32), v)

    s = jnp.arange(128, dtype=jnp.int32).reshape(1, 128)
    timed("flat scalar while", run_flat, s)
    timed(f"nested (inner K={K})", run_nested, s)
    timed("flat + cond", run_cond, s)

    v = jnp.ones((8, 128), jnp.float32)
    r = jax.jit(run_vec)(v)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jax.jit(run_vec)(v))
    dt = (time.perf_counter() - t0) / 5
    print(f"{'flat + 2x(2,128) vec':28s}: {dt*1e3:8.2f} ms  ({dt/NV*1e9:7.1f} ns/iter)")


if __name__ == "__main__":
    main()
