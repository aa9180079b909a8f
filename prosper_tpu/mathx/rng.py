"""GPU hash/PRNG parity with the reference's random.glsl.

Implements the Jarzynski & Olano PCG hashes used by every stochastic pass in
the reference (path tracer, ReSTIR, stochastic alpha, particles) so that
sample streams can match the Vulkan renders bit-for-bit in fp32.

Reference: /root/reference/res/shader/common/random.glsl:7-28 (pcg, pcg3d),
:46-67 (stateful rnd01/rnd2d01/rnd3d01), :69-81 (radicalInverse2/hammersley);
Halton(2,3) jitter table /root/reference/src/scene/Camera.cpp:22-36.

All functions are vectorised: they take/return jnp.uint32 arrays of any shape
(pcg3d state has a trailing axis of 3).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


def pcg(v):
    """pcg hash of a uint32 array (random.glsl:7-13)."""
    v = v.astype(_U32)
    state = v * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def pcg3d(v):
    """pcg3d hash of a (..., 3) uint32 array (random.glsl:17-28)."""
    v = v.astype(_U32)
    v = v * _U32(1664525) + _U32(1013904223)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> _U32(16))
    y = y ^ (y >> _U32(16))
    z = z ^ (z >> _U32(16))
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return jnp.stack([x, y, z], axis=-1)


def rng_to01(u):
    """uint32 -> [0,1] float32 (random.glsl:42)."""
    return u.astype(jnp.float32) / np.float32(0xFFFFFFFF)


def make_state(px: jnp.ndarray, py: jnp.ndarray, frame: jnp.ndarray):
    """Initial pcg_state = uvec3(px, py, frameIndex) (random.glsl:45)."""
    px = jnp.asarray(px, _U32)
    py = jnp.asarray(py, _U32)
    frame = jnp.broadcast_to(jnp.asarray(frame, _U32), px.shape)
    return jnp.stack([px, py, frame], axis=-1)


def rnd01(state):
    """Advance state; return (new_state, 1 float in [0,1]) (random.glsl:48-56)."""
    state = pcg3d(state)
    return state, rng_to01(state[..., 0])


def rnd2d01(state):
    state = pcg3d(state)
    return state, rng_to01(state[..., :2])


def rnd3d01(state):
    state = pcg3d(state)
    return state, rng_to01(state[..., :3])


def uint_to_color(x):
    """Pastel-ish debug hash color (random.glsl:30-40)."""
    xr = pcg(x)
    r = (xr >> _U32(20)) & _U32(0x3FF)
    g = (xr >> _U32(10)) & _U32(0x3FF)
    b = xr & _U32(0x3FF)
    return jnp.stack([r, g, b], axis=-1).astype(jnp.float32) / np.float32(0x3FF)


def radical_inverse2(i):
    """Base-2 radical inverse via bit reversal (random.glsl:71-74)."""
    i = jnp.asarray(i, _U32)
    rev = jnp.zeros_like(i)
    for shift in range(32):
        rev = rev | (((i >> _U32(shift)) & _U32(1)) << _U32(31 - shift))
    return rev.astype(jnp.float32) * np.float32(2.32830643653896e-10)


def hammersley(i, n):
    i = jnp.asarray(i, _U32)
    return jnp.stack(
        [i.astype(jnp.float32) / np.float32(n), radical_inverse2(i)], axis=-1
    )


# Halton base-2/base-3 subpixel jitter sequence used for TAA
# (Camera.cpp:22-36, Karis "High Quality Temporal Supersampling").
HALTON_23 = np.array(
    [
        [0.5, 0.3333333333333333],
        [0.25, 0.6666666666666666],
        [0.75, 0.1111111111111111],
        [0.125, 0.4444444444444444],
        [0.625, 0.7777777777777778],
        [0.375, 0.2222222222222222],
        [0.875, 0.5555555555555556],
        [0.0625, 0.8888888888888888],
    ],
    dtype=np.float32,
)
