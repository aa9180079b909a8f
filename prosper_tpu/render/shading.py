"""Direct light evaluation over VisibleSurface batches.

Parity with /root/reference/res/shader/scene/lighting.glsl:
- evalDirectionalLight (:8-12)
- evaluateUnshadowedPointLight (:14-36): radial (1-(d/r)^4) falloff / d^2
- evaluateUnshadowedSpotLight (:38-55): glTF angular attenuation
- sampleLight (:57-88): uniform index -> {sun, point, spot}
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.brdf import eval_brdf_times_nol


def _norm(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def eval_directional_light(surface: dict, lights: dict) -> jnp.ndarray:
    l = -_norm(lights["dir_direction"])
    l = jnp.broadcast_to(l, surface["position_ws"].shape)
    return lights["dir_irradiance"] * eval_brdf_times_nol(
        l,
        surface["inv_view_ray"],
        surface["normal_ws"],
        surface["albedo"],
        surface["roughness"],
        surface["metallic"],
    )


def point_light_irradiance(lights: dict, idx: jnp.ndarray, pos_ws: jnp.ndarray):
    """Returns (l, d, irradiance) for point light idx at surface positions."""
    p = lights["point_position"][idx]
    radiance = lights["point_radiance"][idx]
    radius = lights["point_radius"][idx]
    to_light = p - pos_ws
    d2 = jnp.sum(to_light * to_light, axis=-1)
    d = jnp.sqrt(d2)
    l = to_light / jnp.maximum(d[..., None], 1e-20)
    dpr = d / radius
    dpr2 = dpr * dpr
    radial = jnp.clip(1.0 - dpr2 * dpr2, 0.0, 1.0)
    irr = radiance * (radial / jnp.maximum(d2, 1e-20))[..., None]
    return l, d, irr


def spot_light_irradiance(lights: dict, idx: jnp.ndarray, pos_ws: jnp.ndarray):
    p = lights["spot_position"][idx]
    to_light = p - pos_ws
    d2 = jnp.sum(to_light * to_light, axis=-1)
    d = jnp.sqrt(d2)
    l = to_light / jnp.maximum(d[..., None], 1e-20)
    cd = jnp.sum(-lights["spot_direction"][idx] * l, axis=-1)
    ang = jnp.clip(
        cd * lights["spot_angle_scale"][idx] + lights["spot_angle_offset"][idx],
        0.0,
        1.0,
    )
    ang = ang * ang
    irr = lights["spot_radiance"][idx] * (ang / jnp.maximum(d2, 1e-20))[..., None]
    return l, d, irr


def pack_light_table(lights: dict) -> jnp.ndarray:
    """Unified (1 + P + S, 12) light rows so sampleLight is ONE row gather:
    [kind, radiance/irradiance(3), position/direction(3), radius/angleScale,
     spot_dir(3) or 0, angleOffset]. Row 0 = sun (sampleLight order)."""
    p = lights["point_position"].shape[0]
    s = lights["spot_position"].shape[0]
    rows = jnp.zeros((1 + p + s, 12), jnp.float32)
    rows = rows.at[0, 0].set(0.0)
    rows = rows.at[0, 1:4].set(lights["dir_irradiance"])
    rows = rows.at[0, 4:7].set(lights["dir_direction"])
    rows = rows.at[1 : 1 + p, 0].set(1.0)
    rows = rows.at[1 : 1 + p, 1:4].set(lights["point_radiance"])
    rows = rows.at[1 : 1 + p, 4:7].set(lights["point_position"])
    rows = rows.at[1 : 1 + p, 7].set(lights["point_radius"])
    rows = rows.at[1 + p :, 0].set(2.0)
    rows = rows.at[1 + p :, 1:4].set(lights["spot_radiance"])
    rows = rows.at[1 + p :, 4:7].set(lights["spot_position"])
    rows = rows.at[1 + p :, 7].set(lights["spot_angle_scale"])
    rows = rows.at[1 + p :, 8:11].set(lights["spot_direction"])
    rows = rows.at[1 + p :, 11].set(lights["spot_angle_offset"])
    return rows


def sample_light_packed(rows: jnp.ndarray, light_index: jnp.ndarray, pos_ws):
    """sampleLight over the packed table: one (R, 12) gather."""
    r = rows[light_index]  # (R, 12)
    kind = r[..., 0]
    radiance = r[..., 1:4]

    # sun
    sun_l = -_norm(r[..., 4:7])
    # point/spot share distance terms
    to_light = r[..., 4:7] - pos_ws
    d2 = jnp.sum(to_light * to_light, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
    pl = to_light / dist[..., None]

    # point radial falloff
    dpr = dist / jnp.maximum(r[..., 7], 1e-20)
    dpr2 = dpr * dpr
    radial = jnp.clip(1.0 - dpr2 * dpr2, 0.0, 1.0)
    p_irr = radiance * (radial / jnp.maximum(d2, 1e-20))[..., None]

    # spot angular falloff
    cd = jnp.sum(-r[..., 8:11] * pl, axis=-1)
    ang = jnp.clip(cd * r[..., 7] + r[..., 11], 0.0, 1.0)
    ang = ang * ang
    s_irr = radiance * (ang / jnp.maximum(d2, 1e-20))[..., None]

    is_sun = kind == 0.0
    is_point = kind == 1.0
    l = jnp.where(is_sun[..., None], sun_l, pl)
    d = jnp.where(is_sun, 100.0, dist)
    irr = jnp.where(
        is_sun[..., None],
        radiance,
        jnp.where(is_point[..., None], p_irr, s_irr),
    )
    return l, d, irr


def sample_light(lights: dict, light_index: jnp.ndarray, pos_ws: jnp.ndarray):
    """Uniform light pick: 0 = sun, then points, then spots
    (lighting.glsl:57-88). Returns (l, dist, irradiance).

    Uses the packed row table when present (one gather instead of ~10)."""
    if "packed_rows" in lights:
        return sample_light_packed(lights["packed_rows"], light_index, pos_ws)
    pc = lights["point_count"]
    # sun
    sun_l = jnp.broadcast_to(-_norm(lights["dir_direction"]), pos_ws.shape)
    sun_d = jnp.full(pos_ws.shape[:-1], 100.0, jnp.float32)
    sun_irr = jnp.broadcast_to(lights["dir_irradiance"], pos_ws.shape)

    pi = jnp.clip(light_index - 1, 0, lights["point_position"].shape[0] - 1)
    pl, pd, pirr = point_light_irradiance(lights, pi, pos_ws)

    si = jnp.clip(light_index - 1 - pc, 0, lights["spot_position"].shape[0] - 1)
    sl, sd, sirr = spot_light_irradiance(lights, si, pos_ws)

    is_sun = light_index == 0
    is_point = (~is_sun) & (light_index - 1 < pc)

    l = jnp.where(
        is_sun[..., None], sun_l, jnp.where(is_point[..., None], pl, sl)
    )
    d = jnp.where(is_sun, sun_d, jnp.where(is_point, pd, sd))
    irr = jnp.where(
        is_sun[..., None], sun_irr, jnp.where(is_point[..., None], pirr, sirr)
    )
    return l, d, irr
