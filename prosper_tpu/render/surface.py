"""Hit -> VisibleSurface evaluation: attribute gather, barycentric
interpolation, world transform, material sampling, normal mapping.

Parity with evaluateSurface in the reference's raygen
(/root/reference/res/shader/rt/reference/main.rgen:146-180) and
visible_surface.glsl; mappedNormal from mikktspace.com (main.rgen:37-45).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.texture import sample_material


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def mapped_normal(normal_ts, n, t, sgn):
    """Tangent-space normal -> world (main.rgen:37-45)."""
    b = sgn[..., None] * jnp.cross(n, t)
    return _normalize(
        normal_ts[..., 0:1] * t + normal_ts[..., 1:2] * b + normal_ts[..., 2:3] * n
    )


def evaluate_surface_from_attrs(
    arena: dict,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    hit: dict,
):
    """VisibleSurface from the fused hit kernel's interpolated attributes
    (ops/trace_pallas_full.py): zero vertex/instance gathers — only the
    material row + texture quad fetches remain."""
    from ..ops.texture import sample_material_packed

    n_ws = _normalize(hit["normal"])
    t_ws = _normalize(hit["tangent"][..., :3])
    t_sign = hit["tangent"][..., 3]
    uv = hit["uv"]
    material = hit["material"]
    position = ray_o + hit["t"][..., None] * ray_d

    mat = sample_material_packed(arena, material, uv)
    has_map = (mat["normal_ts"][..., 0] != -2.0) & (t_sign != 0.0)
    n_mapped = mapped_normal(mat["normal_ts"], n_ws, t_ws, t_sign)
    normal_ws = jnp.where(has_map[..., None], n_mapped, n_ws)

    inv_view = -ray_d
    NoV = jnp.clip(jnp.sum(normal_ws * inv_view, axis=-1), 0.0, 1.0)
    return {
        "valid": hit["tri"] >= 0,
        "position_ws": position,
        "normal_ws": normal_ws,
        "uv": uv,
        "albedo": mat["albedo"],
        "alpha": mat["alpha"],
        "roughness": mat["roughness"],
        "metallic": mat["metallic"],
        "material": material,
        "inv_view_ray": inv_view,
        "NoV": NoV,
        "linear_depth": hit["t"],
    }


def evaluate_surface(
    static_scene: dict,
    frame: dict,
    arena: dict,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    hit: dict,
    lod=None,
):
    """Gather/interpolate vertex attributes at hits and sample materials.

    hit: dict from trace_closest (t, tri, u, v); tri < 0 = miss (outputs
    are garbage-but-finite there; callers mask).

    Returns a VisibleSurface dict: position_ws, normal_ws, geo_normal_ws,
    uv, albedo, alpha, roughness, metallic, material (R,), NoV,
    inv_view_ray (unit, towards eye), linear_depth, valid.
    """
    tri = jnp.maximum(hit["tri"], 0)
    u = hit["u"][..., None]
    v = hit["v"][..., None]
    w = 1.0 - u - v

    aidx = static_scene["wt_aidx"][tri]  # (R, 3) vertex arena indices
    ap = static_scene["a_packed"]  # (V, 12): n3 | t4 | uv2 | pad

    a0, a1, a2 = ap[aidx[..., 0]], ap[aidx[..., 1]], ap[aidx[..., 2]]
    # interpolate(v0,v1,v2, baryCoord): w*v0 + u*v1 + v*v2
    ai = w * a0 + u * a1 + v * a2
    n_obj = ai[..., 0:3]
    t_obj4 = ai[..., 3:7]
    uv = ai[..., 7:9]

    inst = static_scene["wt_instance"][tri]
    if "inst_packed" in frame:
        # one (R, 21) row gather: 3x4 transform | 3x3 normal matrix
        ip = frame["inst_packed"][inst]
        m = ip[..., :12].reshape(ip.shape[:-1] + (3, 4))
        nm = ip[..., 12:21].reshape(ip.shape[:-1] + (3, 3))
    else:
        nm = frame["normal_transforms"][inst]  # (R, 3, 3)
        m = frame["transforms"][inst]  # (R, 3, 4)
    n_ws = _normalize(jnp.einsum("...ij,...j->...i", nm, n_obj))
    t_ws = _normalize(jnp.einsum("...ij,...j->...i", m[..., :3], t_obj4[..., :3]))
    t_sign = t_obj4[..., 3]

    position = ray_o + hit["t"][..., None] * ray_d

    material = static_scene["wt_material"][tri]
    if lod is None and "mat_f32" in arena:
        from ..ops.texture import sample_material_packed

        mat = sample_material_packed(arena, material, uv)
    else:
        mat = sample_material(arena, static_scene["materials"], material, uv, lod)

    # normal mapping when a normal texture and a real tangent exist
    has_map = (mat["normal_ts"][..., 0] != -2.0) & (t_sign != 0.0)
    n_mapped = mapped_normal(mat["normal_ts"], n_ws, t_ws, t_sign)
    normal_ws = jnp.where(has_map[..., None], n_mapped, n_ws)

    inv_view = -ray_d
    NoV = jnp.clip(jnp.sum(normal_ws * inv_view, axis=-1), 0.0, 1.0)

    return {
        "valid": hit["tri"] >= 0,
        "position_ws": position,
        "normal_ws": normal_ws,
        "uv": uv,
        "albedo": mat["albedo"],
        "alpha": mat["alpha"],
        "roughness": mat["roughness"],
        "metallic": mat["metallic"],
        "material": material,
        "instance": inst,
        "inv_view_ray": inv_view,
        "NoV": NoV,
        "linear_depth": hit["t"],
    }
