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


def sample_light(lights: dict, light_index: jnp.ndarray, pos_ws: jnp.ndarray):
    """Uniform light pick: 0 = sun, then points, then spots
    (lighting.glsl:57-88). Returns (l, dist, irradiance)."""
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
