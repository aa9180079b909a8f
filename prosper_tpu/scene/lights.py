"""Light data: glTF -> flat device arrays with the reference's conventions.

Capacities and unit conversions match the reference:
- 1 directional + <=1024 point + <=1024 spot
  (/root/reference/src/scene/Light.hpp:27,45)
- directional: irradiance = color * intensity (W/m^2)
  (WorldData.cpp:1467-1474), default (2,2,2) dir (-1,-1,-1) (lights.h:17-20)
- point: radiance = color * intensity / 4pi; radius = range > 0 ? range :
  sqrt(luminance/0.01) (WorldData.cpp:1478-1500)
- spot: radiance = color*intensity/4pi; glTF angular attenuation
  angleScale/angleOffset (WorldData.cpp:1502-1527)
- attenuation math parity with scene/lighting.glsl:14-55
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .gltf import GltfDocument

MAX_POINT_LIGHTS = 1024
MAX_SPOT_LIGHTS = 1024


@dataclass
class LightArrays:
    """Fixed-capacity SoA light buffers (the lightData ring analog)."""

    dir_irradiance: np.ndarray = field(
        default_factory=lambda: np.array([2.0, 2.0, 2.0], np.float32)
    )
    dir_direction: np.ndarray = field(
        default_factory=lambda: np.array([-1.0, -1.0, -1.0], np.float32)
    )
    # PointLight: radianceAndRadius, position (lights.h:22-26)
    point_radiance: np.ndarray = field(
        default_factory=lambda: np.zeros((MAX_POINT_LIGHTS, 3), np.float32)
    )
    point_radius: np.ndarray = field(
        default_factory=lambda: np.ones(MAX_POINT_LIGHTS, np.float32)
    )
    point_position: np.ndarray = field(
        default_factory=lambda: np.zeros((MAX_POINT_LIGHTS, 3), np.float32)
    )
    point_count: int = 0
    # SpotLight: radianceAndAngleScale, positionAndAngleOffset, direction
    spot_radiance: np.ndarray = field(
        default_factory=lambda: np.zeros((MAX_SPOT_LIGHTS, 3), np.float32)
    )
    spot_angle_scale: np.ndarray = field(
        default_factory=lambda: np.zeros(MAX_SPOT_LIGHTS, np.float32)
    )
    spot_angle_offset: np.ndarray = field(
        default_factory=lambda: np.zeros(MAX_SPOT_LIGHTS, np.float32)
    )
    spot_position: np.ndarray = field(
        default_factory=lambda: np.zeros((MAX_SPOT_LIGHTS, 3), np.float32)
    )
    spot_direction: np.ndarray = field(
        default_factory=lambda: np.zeros((MAX_SPOT_LIGHTS, 3), np.float32)
    )
    spot_count: int = 0


def load_lights(doc: GltfDocument) -> LightArrays:
    """Static light parameters (positions/directions filled by update_scene)."""
    la = LightArrays()
    for light in doc.lights:
        color = light.color.astype(np.float32)
        if light.kind == "directional":
            la.dir_irradiance = color * np.float32(light.intensity)
        elif light.kind == "point":
            if la.point_count >= MAX_POINT_LIGHTS:
                continue
            radiance = color * np.float32(light.intensity) / (4.0 * np.pi)
            lum = float(np.dot(radiance, [0.2126, 0.7152, 0.0722]))
            radius = light.range if light.range > 0 else float(np.sqrt(lum / 0.01))
            la.point_radiance[la.point_count] = radiance
            la.point_radius[la.point_count] = radius
            la.point_count += 1
        elif light.kind == "spot":
            if la.spot_count >= MAX_SPOT_LIGHTS:
                continue
            angle_scale = 1.0 / max(
                0.001,
                float(np.cos(light.inner_cone_angle) - np.cos(light.outer_cone_angle)),
            )
            angle_offset = -float(np.cos(light.outer_cone_angle)) * angle_scale
            la.spot_radiance[la.spot_count] = color * np.float32(light.intensity) / (
                4.0 * np.pi
            )
            la.spot_angle_scale[la.spot_count] = angle_scale
            la.spot_angle_offset[la.spot_count] = angle_offset
            la.spot_count += 1
    return la


def light_uniforms(la: LightArrays) -> dict[str, np.ndarray]:
    """Device pytree for the shading kernels."""
    # Compact packed rows in sampleLight index order: sun, then the
    # *counted* points, then the counted spots (lighting.glsl:57-88).
    pc, sc = int(la.point_count), int(la.spot_count)
    rows = np.zeros((1 + MAX_POINT_LIGHTS + MAX_SPOT_LIGHTS, 12), np.float32)
    rows[0, 1:4] = la.dir_irradiance
    rows[0, 4:7] = la.dir_direction
    rows[1 : 1 + pc, 0] = 1.0
    rows[1 : 1 + pc, 1:4] = la.point_radiance[:pc]
    rows[1 : 1 + pc, 4:7] = la.point_position[:pc]
    rows[1 : 1 + pc, 7] = la.point_radius[:pc]
    rows[1 + pc : 1 + pc + sc, 0] = 2.0
    rows[1 + pc : 1 + pc + sc, 1:4] = la.spot_radiance[:sc]
    rows[1 + pc : 1 + pc + sc, 4:7] = la.spot_position[:sc]
    rows[1 + pc : 1 + pc + sc, 7] = la.spot_angle_scale[:sc]
    rows[1 + pc : 1 + pc + sc, 8:11] = la.spot_direction[:sc]
    rows[1 + pc : 1 + pc + sc, 11] = la.spot_angle_offset[:sc]
    return {
        "packed_rows": rows,
        "dir_irradiance": la.dir_irradiance,
        "dir_direction": la.dir_direction,
        "point_radiance": la.point_radiance,
        "point_radius": la.point_radius,
        "point_position": la.point_position,
        "point_count": np.int32(la.point_count),
        "spot_radiance": la.spot_radiance,
        "spot_angle_scale": la.spot_angle_scale,
        "spot_angle_offset": la.spot_angle_offset,
        "spot_position": la.spot_position,
        "spot_direction": la.spot_direction,
        "spot_count": np.int32(la.spot_count),
    }
