"""Texture sampling: gather + decode + filter over the flat texel arena.

The TPU analog of Vulkan's sampler2D reads in materials.glsl
(/root/reference/res/shader/scene/materials.glsl:46-121): sRGB decode
happens per texel BEFORE filtering (matching VK_FORMAT_*_SRGB views),
wrap mode is REPEAT (the glTF default used by the bundled scenes).

Sampling returns linear-space float RGBA.
"""

from __future__ import annotations

import jax.numpy as jnp


def _decode_texel(packed, srgb_mask):
    """(...,) u32 + bool -> (..., 4) linear float."""
    p = packed.astype(jnp.uint32)
    r = (p & 0xFF).astype(jnp.float32) / 255.0
    g = ((p >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = ((p >> 16) & 0xFF).astype(jnp.float32) / 255.0
    a = ((p >> 24) & 0xFF).astype(jnp.float32) / 255.0
    rgb = jnp.stack([r, g, b], axis=-1)
    lin = jnp.where(
        rgb <= 0.04045, rgb / 12.92, jnp.power((rgb + 0.055) / 1.055, 2.4)
    )
    rgb = jnp.where(srgb_mask[..., None], lin, rgb)
    return jnp.concatenate([rgb, a[..., None]], axis=-1)


def sample_bilinear(arena: dict, tex: jnp.ndarray, uv: jnp.ndarray, mip):
    """Bilinear sample at integer mip. tex: (R,) i32 texture ids,
    uv: (R, 2), mip: (R,) i32. Returns (R, 4) linear."""
    table = arena["table"]  # (T, M, 4)
    entry = table[tex, mip]  # (R, 4) gather
    off = entry[..., 0]
    w = entry[..., 1]
    h = entry[..., 2]
    srgb = entry[..., 3] > 0

    # REPEAT wrap
    u = uv[..., 0] * w.astype(jnp.float32) - 0.5
    v = uv[..., 1] * h.astype(jnp.float32) - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0

    def wrap(x, n):
        return jnp.mod(x.astype(jnp.int32), n)

    x0 = wrap(u0, w)
    x1 = wrap(u0 + 1, w)
    y0 = wrap(v0, h)
    y1 = wrap(v0 + 1, h)

    data = arena["data"]
    t00 = _decode_texel(data[off + y0 * w + x0], srgb)
    t10 = _decode_texel(data[off + y0 * w + x1], srgb)
    t01 = _decode_texel(data[off + y1 * w + x0], srgb)
    t11 = _decode_texel(data[off + y1 * w + x1], srgb)
    fu = fu[..., None]
    fv = fv[..., None]
    return (
        t00 * (1 - fu) * (1 - fv)
        + t10 * fu * (1 - fv)
        + t01 * (1 - fu) * fv
        + t11 * fu * fv
    )


def sample_trilinear(arena: dict, tex: jnp.ndarray, uv: jnp.ndarray, lod):
    """Trilinear sample at fractional lod (clamped per texture)."""
    n_mips = arena["n_mips"][tex].astype(jnp.float32)
    lod = jnp.clip(lod, 0.0, n_mips - 1.0)
    m0 = jnp.floor(lod).astype(jnp.int32)
    m1 = jnp.minimum(m0 + 1, (n_mips - 1.0).astype(jnp.int32))
    f = (lod - m0.astype(jnp.float32))[..., None]
    s0 = sample_bilinear(arena, tex, uv, m0)
    s1 = sample_bilinear(arena, tex, uv, m1)
    return s0 * (1 - f) + s1 * f


def sample_material(arena: dict, materials: dict, mat_idx: jnp.ndarray, uv, lod=None):
    """sampleMaterial parity (materials.glsl:46-121).

    Returns dict: albedo (R,3) linear, alpha (R,) with the reference's
    signalling (-1 opaque, 0 failed mask test, else blend alpha),
    roughness, metallic (R,), normal_ts (R,3) with x == -2 when no normal
    map.
    """
    R = mat_idx.shape
    base_tex = materials["base_color_tex"][mat_idx]
    mr_tex = materials["metallic_roughness_tex"][mat_idx]
    nrm_tex = materials["normal_tex"][mat_idx]
    lod = jnp.zeros(R, jnp.float32) if lod is None else lod

    base = jnp.where(
        (base_tex > 0)[..., None],
        sample_trilinear(arena, base_tex, uv, lod),
        jnp.ones(R + (4,), jnp.float32),
    )
    base = base * materials["base_color_factor"][mat_idx]

    alpha_mode = materials["alpha_mode"][mat_idx]
    cutoff = materials["alpha_cutoff"][mat_idx]
    # -1 opaque; mask: 0 if fail else -1; blend: alpha
    alpha = jnp.where(
        alpha_mode == 2,
        base[..., 3],
        jnp.where((alpha_mode == 1) & (base[..., 3] < cutoff), 0.0, -1.0),
    )

    mr = jnp.where(
        (mr_tex > 0)[..., None],
        sample_trilinear(arena, mr_tex, uv, lod),
        jnp.ones(R + (4,), jnp.float32),
    )
    roughness = mr[..., 1] * materials["roughness_factor"][mat_idx]
    metallic = mr[..., 2] * materials["metallic_factor"][mat_idx]
    roughness = jnp.maximum(roughness, 0.05)

    nrm = sample_trilinear(arena, nrm_tex, uv, lod)
    normal_ts = jnp.where(
        (nrm_tex > 0)[..., None],
        nrm[..., :3] * 2.0 - 1.0,
        jnp.full(R + (3,), -2.0, jnp.float32),
    )

    return {
        "albedo": base[..., :3],
        "alpha": alpha,
        "roughness": roughness,
        "metallic": metallic,
        "normal_ts": normal_ts,
    }
