"""Display transform: exposure -> HSV contrast -> Tony McMapface 3D LUT ->
inverse gamma. Parity with /root/reference/res/shader/tone_map.comp:17-60.

The 48^3 LUT ships with the reference
(res/texture/tony_mc_mapface.dds, R9G9B9E5) and is sampled trilinearly
with texel-center alignment exactly like the GLSL.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..io.dds import read_dds
from ..mathx.color import hsv_to_rgb, rgb_to_hsv

LUT_DIMS = 48
_TONY_PATH = "/root/reference/res/texture/tony_mc_mapface.dds"


def load_tony_mc_mapface(path: str = _TONY_PATH) -> np.ndarray:
    """(48, 48, 48, 3) float32, indexed [b][g][r] (DDS depth-major)."""
    img = read_dds(path)
    lut = img.mips[0]
    assert lut.shape == (LUT_DIMS, LUT_DIMS, LUT_DIMS, 3)
    return lut.astype(np.float32)


def sample_lut_trilinear(lut: jnp.ndarray, uvw: jnp.ndarray) -> jnp.ndarray:
    """Trilinear 3D LUT fetch; uvw in [0,1]^3 maps to texel centers already
    (caller applies the (d-1)/d + 0.5/d alignment)."""
    d = LUT_DIMS
    # uvw -> continuous texel coords (centers at i+0.5)
    c = uvw * d - 0.5
    c0 = jnp.floor(c)
    f = c - c0
    i0 = jnp.clip(c0.astype(jnp.int32), 0, d - 1)
    i1 = jnp.clip(i0 + 1, 0, d - 1)

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = f[..., 0:1], f[..., 1:2], f[..., 2:3]

    def g(z, y, x):
        return lut[z, y, x]

    c000 = g(z0, y0, x0)
    c100 = g(z0, y0, x1)
    c010 = g(z0, y1, x0)
    c110 = g(z0, y1, x1)
    c001 = g(z1, y0, x0)
    c101 = g(z1, y0, x1)
    c011 = g(z1, y1, x0)
    c111 = g(z1, y1, x1)

    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0_ = c00 * (1 - fy) + c10 * fy
    c1_ = c01 * (1 - fy) + c11 * fy
    return c0_ * (1 - fz) + c1_ * fz


def tony_mc_mapface(lut: jnp.ndarray, stimulus: jnp.ndarray) -> jnp.ndarray:
    """tone_map.comp:16-28."""
    encoded = stimulus / (stimulus + 1.0)
    uv = encoded * ((LUT_DIMS - 1.0) / LUT_DIMS) + 0.5 / LUT_DIMS
    return sample_lut_trilinear(lut, uv)


def tone_map(
    color: jnp.ndarray,
    lut: jnp.ndarray,
    exposure: float = 1.0,
    contrast: float = 1.0,
) -> jnp.ndarray:
    """Full display transform (tone_map.comp:31-60). color: (..., 3) linear
    HDR -> (..., 3) gamma-encoded display."""
    color = color * exposure
    hsv = rgb_to_hsv(color)
    hsv = hsv.at[..., 2].set(jnp.power(jnp.maximum(hsv[..., 2], 0.0), contrast))
    color = hsv_to_rgb(hsv)
    color = tony_mc_mapface(lut, color)
    return jnp.power(jnp.maximum(color, 0.0), 1.0 / 2.2)
