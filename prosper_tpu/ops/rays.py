"""Camera ray generation + self-intersection offset.

Parity with /root/reference/res/shader/rt/ray.glsl:
- pinholeCameraRay (:15-43, RT Gems 2 ch.14 construction from the
  worldToCamera rows and projection diagonal)
- thinLensCameraRay (:46-79)
- offsetRay (:81-105, Wächter-Binder bit-level offset)

All functions are batched over (..., ) pixel arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PI = np.float32(np.pi)


def pinhole_rays(cam: dict, uv: jnp.ndarray):
    """uv: (..., 2) in [0,1] (already jittered). Returns (o, d)."""
    nd = uv * 2.0 - 1.0
    c2c = cam["camera_to_clip"]
    w2c = cam["world_to_camera"]
    aspect = c2c[1, 1] / c2c[0, 0]
    tan_half_fov_y = 1.0 / c2c[1, 1]
    right = w2c[0, :3]
    up = w2c[1, :3]
    fwd = -w2c[2, :3]
    d = (
        nd[..., 0:1] * right * tan_half_fov_y * aspect
        + nd[..., 1:2] * up * tan_half_fov_y
        + fwd
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam["eye"], d.shape)
    return o, d


def thin_lens_rays(cam: dict, uv: jnp.ndarray, lens_u: jnp.ndarray):
    """Thin-lens DoF rays (ray.glsl:46-79). lens_u: (..., 2) uniforms."""
    o0, d0 = pinhole_rays(cam, uv)
    w2c = cam["world_to_camera"]
    fwd = -w2c[2, :3]

    theta = lens_u[..., 0] * 2.0 * _PI
    radius = lens_u[..., 1]
    u = jnp.cos(theta) * jnp.sqrt(radius)
    v = jnp.sin(theta) * jnp.sqrt(radius)

    focus_distance = cam["focus_distance"]
    focal_length = cam["focal_length"]
    aperture = cam["aperture_diameter"]

    focus_point = o0 + d0 * (
        focus_distance / jnp.sum(d0 * fwd, axis=-1, keepdims=True)
    )
    f_stop = focal_length / aperture
    coc_radius = focal_length / (2.0 * f_stop)
    lens_pos_cam = jnp.stack(
        [u * coc_radius, v * coc_radius, jnp.zeros_like(u)], axis=-1
    )
    c2w = cam["camera_to_world"]
    o = lens_pos_cam @ c2w[:3, :3].T + c2w[:3, 3]
    d = focus_point - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def offset_ray(p: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Wächter-Binder robust origin offset along the normal (ray.glsl:81-105).

    Exact bit-level parity: integer offset of the float mantissa scaled by
    magnitude, with a fixed-point fallback near the origin.
    """
    origin = jnp.float32(1.0 / 32.0)
    float_scale = jnp.float32(1.0 / 65536.0)
    int_scale = jnp.float32(256.0)

    of_i = (int_scale * n).astype(jnp.int32)
    bits = jax.lax.bitcast_convert_type(p.astype(jnp.float32), jnp.int32)
    shifted = jnp.where(p < 0.0, bits - of_i, bits + of_i)
    p_int = jax.lax.bitcast_convert_type(shifted, jnp.float32)
    p_float = p + float_scale * n
    return jnp.where(jnp.abs(p) < origin, p_float, p_int)
