#!/usr/bin/env python
"""XLA row-gather throughput vs table size on the TPU (device ms via
xplane). Decides the texture-tap strategy: if small tables gather much
faster, bounce taps should hit a mip-clamped compact arena."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from prosper_tpu.utils.profiler import profile_device_ops

    R = 2_000_000
    rng = np.random.default_rng(0)

    for rows in (65_536, 1_048_576, 8_388_608, 43_000_000):
        table = jnp.asarray(
            rng.integers(0, 2**31, (rows, 4), dtype=np.int64).astype(np.uint32)
        )
        idx = jnp.asarray(rng.integers(0, rows, (R,)).astype(np.int32))

        @jax.jit
        def g(t, i):
            return t[i]

        ops = profile_device_ops(
            lambda: g(table, idx), lambda x: int(x[0, 0]), top_n=3
        )
        total = sum(ms for _, ms in ops if "fusion" in _ or "gather" in _)
        mb = rows * 16 / 1e6
        print(f"table {mb:8.1f} MB: top ops {[(n[:30], round(m,1)) for n, m in ops]}",
              flush=True)


if __name__ == "__main__":
    main()
