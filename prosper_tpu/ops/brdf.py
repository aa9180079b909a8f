"""PBR BRDF evaluation + importance sampling with exact reference parity.

- lambert/Trowbridge-Reitz(GGX)/Schlick Fresnel/Schlick-Smith geometry:
  /root/reference/res/shader/brdf.glsl:9-88 (glTF metallic-roughness spec)
- cosine hemisphere + VNDF sampling, Duff orthonormal basis:
  /root/reference/res/shader/common/sampling.glsl

All functions are batched jnp over (..., 3) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_PI = np.float32(np.pi)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def lambert_brdf(c_diff):
    return c_diff / _PI


def trowbridge_reitz(NoH, alpha):
    a2 = alpha * alpha
    denom = NoH * NoH * (a2 - 1.0) + 1.0
    return a2 / (_PI * denom * denom)


def schlick_fresnel(VoH, f0):
    return f0 + (1.0 - f0) * jnp.power(1.0 - VoH, 5.0)[..., None]


def schlick_fresnel_with_roughness(VoH, f0, roughness):
    return f0 + (
        jnp.maximum((1.0 - roughness)[..., None], f0) - f0
    ) * jnp.power(1.0 - VoH, 5.0)[..., None]


def schlick_trowbridge_reitz(NoL, NoV, alpha):
    k = jnp.maximum(alpha * 0.5, 1e-4)
    gl = NoL / (NoL * (1.0 - k) + k)
    gv = NoV / (NoV * (1.0 - k) + k)
    return gl * gv


def cook_torrance_brdf(NoL, NoV, NoH, VoH, f0, roughness):
    alpha = roughness * roughness
    D = trowbridge_reitz(NoH, alpha)
    F = schlick_fresnel(VoH, f0)
    G = schlick_trowbridge_reitz(NoL, NoV, alpha)
    denom = 4.0 * NoL * NoV + 1e-4
    return (D * G / denom)[..., None] * F


def fresnel_zero(albedo, metallic):
    """mix(0.04, albedo, metallic) (brdf.glsl:64-68)."""
    return 0.04 * (1.0 - metallic)[..., None] + albedo * metallic[..., None]


def eval_brdf_times_nol(l, view, normal, albedo, roughness, metallic):
    """evalBRDFTimesNoL (brdf.glsl:70-88): (lambert + cook-torrance) * NoL.

    view = invViewRayWS (unit, towards the eye)."""
    h = l + view
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)
    NoL = saturate(_dot(normal, l))
    NoV = saturate(_dot(normal, view))
    NoH = saturate(_dot(normal, h))
    VoH = saturate(_dot(view, h))
    f0 = fresnel_zero(albedo, metallic)
    c_diff = albedo * (1.0 - 0.04) * (1.0 - metallic)[..., None]
    brdf = lambert_brdf(c_diff) + cook_torrance_brdf(
        NoL, NoV, NoH, VoH, f0, roughness
    )
    return brdf * NoL[..., None]


# ---------------------------------------------------------------------------
# Sampling


def orthonormal_basis(n):
    """Duff et al. revisited ONB (sampling.glsl:37-47). Returns (..., 3, 3)
    rows = (b1, b2, n) so `basis @ v` maps world->local like the GLSL
    transpose(mat3(b1,b2,n)) usage."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    b1 = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    b2 = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return jnp.stack([b1, b2, n], axis=-2)


def cosine_sample_hemisphere(n, u):
    """Shirley sphere-tip construction (sampling.glsl:18-33)."""
    a = (1.0 - 2.0 * u[..., 0]) * 0.99999
    b = jnp.sqrt(1.0 - a * a) * 0.99999
    phi = 2.0 * _PI * u[..., 1]
    offs = jnp.stack([b * jnp.cos(phi), b * jnp.sin(phi), a], axis=-1)
    d = n + offs
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def cosine_hemisphere_pdf(NoL):
    return NoL / _PI


def reflect(i, n):
    return i - 2.0 * _dot(i, n)[..., None] * n


def sample_visible_trowbridge_reitz(ve, alpha, us):
    """Heitz VNDF sampling in local (normal) space (sampling.glsl:53-79).
    ve: (..., 3) view dir in basis space; returns light dir in basis space."""
    alpha = alpha[..., None] if jnp.ndim(alpha) == jnp.ndim(ve) - 1 else alpha
    vh = jnp.concatenate([alpha * ve[..., :2], ve[..., 2:3]], axis=-1)
    vh = vh / jnp.linalg.norm(vh, axis=-1, keepdims=True)
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv, jnp.zeros_like(inv)], -1),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(us[..., 0])
    phi = 2.0 * _PI * us[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(1.0 - p1 * p1) + s * p2
    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))[..., None] * vh
    )
    ne = jnp.concatenate(
        [alpha * nh[..., :2], jnp.maximum(0.0, nh[..., 2:3])], axis=-1
    )
    ne = ne / jnp.maximum(jnp.linalg.norm(ne, axis=-1, keepdims=True), 1e-20)
    return reflect(-ve, ne)


def visible_trowbridge_reitz_pdf(ve, le, alpha):
    """VNDF pdf in basis space (sampling.glsl:81-93)."""
    ne = ve + le
    ne = ne / jnp.maximum(jnp.linalg.norm(ne, axis=-1, keepdims=True), 1e-20)
    NoV = saturate(ve[..., 2])
    NoL = saturate(le[..., 2])
    NoH = saturate(ne[..., 2])
    vndf = (
        schlick_trowbridge_reitz(NoL, NoV, alpha)
        * NoV
        * trowbridge_reitz(NoH, alpha)
        / ve[..., 2]
    )
    return vndf / (4.0 * NoV)


def importance_sample_ibl_trowbridge_reitz(xi, alpha, n):
    """UE4 split-sum GGX half-vector sampling (sampling.glsl:97-113)."""
    phi = 2.0 * _PI * xi[..., 0]
    cos_t = jnp.sqrt((1.0 - xi[..., 1]) / (1.0 + (alpha * alpha - 1.0) * xi[..., 1]))
    sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
    h = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    up = jnp.where(
        (jnp.abs(n[..., 2]) < 0.999)[..., None],
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
    )
    tx = jnp.cross(up, n)
    tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
    ty = jnp.cross(n, tx)
    ty = ty / jnp.linalg.norm(ty, axis=-1, keepdims=True)
    out = tx * h[..., 0:1] + ty * h[..., 1:2] + n * h[..., 2:3]
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
