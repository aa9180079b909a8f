"""PCG hash parity tests against a straightforward uint32 reference
implementation of random.glsl:7-28."""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.mathx import rng


def _pcg_ref(v: int) -> int:
    m = 0xFFFFFFFF
    state = (v * 747796405 + 2891336453) & m
    word = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & m
    return ((word >> 22) ^ word) & m


def _pcg3d_ref(v):
    m = 0xFFFFFFFF
    v = [(x * 1664525 + 1013904223) & m for x in v]
    v[0] = (v[0] + v[1] * v[2]) & m
    v[1] = (v[1] + v[2] * v[0]) & m
    v[2] = (v[2] + v[0] * v[1]) & m
    v = [x ^ (x >> 16) for x in v]
    v[0] = (v[0] + v[1] * v[2]) & m
    v[1] = (v[1] + v[2] * v[0]) & m
    v[2] = (v[2] + v[0] * v[1]) & m
    return v


def test_pcg_matches_scalar_reference():
    xs = np.array([0, 1, 2, 12345, 0xDEADBEEF, 0xFFFFFFFF], dtype=np.uint32)
    got = np.asarray(rng.pcg(jnp.asarray(xs)))
    want = np.array([_pcg_ref(int(x)) for x in xs], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_pcg3d_matches_scalar_reference():
    states = np.array(
        [[0, 0, 0], [1, 2, 3], [640, 360, 17], [0xFFFFFFFF, 7, 0xABCDEF01]],
        dtype=np.uint32,
    )
    got = np.asarray(rng.pcg3d(jnp.asarray(states)))
    want = np.array([_pcg3d_ref([int(x) for x in s]) for s in states], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_rnd01_stream_advances_state():
    s0 = rng.make_state(jnp.array([3]), jnp.array([5]), 7)
    s1, a = rng.rnd01(s0)
    s2, b = rng.rnd01(s1)
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))
    assert 0.0 <= float(a[0]) <= 1.0 and 0.0 <= float(b[0]) <= 1.0
    assert float(a[0]) != float(b[0])


def test_radical_inverse2():
    # radicalInverse2(1) = 0.5, (2) = 0.25, (3) = 0.75
    got = np.asarray(rng.radical_inverse2(jnp.array([1, 2, 3], dtype=jnp.uint32)))
    np.testing.assert_allclose(got, [0.5, 0.25, 0.75], atol=1e-7)


def test_halton23_table_matches_reference():
    # Camera.cpp:25-35 values
    assert rng.HALTON_23.shape == (8, 2)
    np.testing.assert_allclose(rng.HALTON_23[0], [0.5, 1.0 / 3.0], rtol=1e-6)
    np.testing.assert_allclose(rng.HALTON_23[7], [0.0625, 8.0 / 9.0], rtol=1e-6)
