"""Deferred shading: G-buffer + clustered lights -> illumination.

Parity with /root/reference/res/shader/deferred_shading.comp: world-pos
reconstruction from depth, G-buffer decode, directional + clustered
point/spot evaluation, optional IBL. The froxel lists come from
ops/clustering.py (light_clustering.comp analog).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..mathx.packing import signed_oct_decode
from ..ops.clustering import build_light_clusters, eval_clustered_lights
from ..ops.tonemap import tone_map
from .shading import eval_directional_light


def shade_deferred(
    gbuf: dict,
    clusters: dict,
    lights: dict,
    cam: dict,
    width: int,
    height: int,
    ibl_data: dict | None = None,
):
    """Clustered deferred shading over the flat G-buffer."""
    R = width * height
    px = jnp.tile(jnp.arange(width, dtype=jnp.int32), height)
    py = jnp.repeat(jnp.arange(height, dtype=jnp.int32), width)

    # decode G-buffer exactly like loadFromGbuffer (visible_surface.glsl)
    albedo = gbuf["albedo_roughness"][..., :3]
    roughness = gbuf["albedo_roughness"][..., 3]
    normal = signed_oct_decode(gbuf["normal_metallic"][..., :3])
    metallic = gbuf["normal_metallic"][..., 3]

    pos = gbuf["position_ws"]
    inv_view = cam["eye"] - pos
    inv_view = inv_view / jnp.maximum(
        jnp.linalg.norm(inv_view, axis=-1, keepdims=True), 1e-20
    )

    surface = {
        "position_ws": pos,
        "normal_ws": normal,
        "inv_view_ray": inv_view,
        "albedo": albedo,
        "roughness": roughness,
        "metallic": metallic,
        "NoV": jnp.clip(jnp.sum(normal * inv_view, axis=-1), 0.0, 1.0),
    }

    color = eval_directional_light(surface, lights)
    if clusters is None:
        # TPU path: tile-major Pallas kernel — froxel lists loaded once
        # per 32px tile instead of per pixel (ops/shade_tiles.py)
        from ..ops.shade_tiles import shade_clustered_tiles

        color = color + shade_clustered_tiles(
            surface, lights, cam, gbuf["z_cam"], gbuf["valid"], width, height
        )
    else:
        color = color + eval_clustered_lights(
            surface,
            lights,
            clusters,
            px,
            py,
            gbuf["z_cam"],
            cam["near"],
            cam["far"],
        )
    if ibl_data is not None:
        from ..ops.ibl import eval_ibl

        color = color + eval_ibl(surface, ibl_data)
    return jnp.where(gbuf["valid"][..., None], color, 0.0)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "use_taa", "use_bloom", "use_dof", "use_culling"
    ),
)
def render_deferred(
    static_scene: dict,
    frame: dict,
    arena: dict,
    cam: dict,
    lut: jnp.ndarray,
    width: int,
    height: int,
    exposure: float = 1.0,
    contrast: float = 1.0,
    use_taa: bool = False,
    use_bloom: bool = False,
    use_dof: bool = False,
    taa_history: jnp.ndarray | None = None,
    ibl_data: dict | None = None,
    use_culling: bool = False,
    prev_hiz: list | None = None,
):
    """Deferred frame + optional post chain, in the reference's pass order
    (Renderer.cpp:516-584): bloom -> TAA -> DoF -> tone map.

    Returns (display image, new TAA history or None).
    """
    from .gbuffer import render_gbuffer

    gbuf = render_gbuffer(
        static_scene, frame, arena, cam, width, height,
        use_culling=use_culling, prev_hiz=prev_hiz,
    )
    clusters = (
        None
        if jax.default_backend() != "cpu"
        else build_light_clusters(cam, frame["lights"], width, height)
    )
    color = shade_deferred(
        gbuf, clusters, frame["lights"], cam, width, height, ibl_data
    )
    hdr = color.reshape(height, width, 3)
    if ibl_data is not None and "env" in ibl_data:
        # skybox background (SkyboxRenderer analog): sample the env along
        # the view ray for miss pixels
        from ..ops.ibl import sample_cubemap
        from ..ops.rays import pinhole_rays

        ys, xs = jnp.meshgrid(
            (jnp.arange(height, dtype=jnp.float32) + 0.5) / height,
            (jnp.arange(width, dtype=jnp.float32) + 0.5) / width,
            indexing="ij",
        )
        _, vd = pinhole_rays(cam, jnp.stack([xs, ys], -1))
        sky = sample_cubemap(ibl_data["env"], vd)
        valid = gbuf["valid"].reshape(height, width, 1)
        hdr = jnp.where(valid, hdr, sky)

    if use_bloom:
        from ..ops.bloom import bloom_multi_res

        hdr = bloom_multi_res(hdr)

    new_history = None
    if use_taa:
        from ..ops.taa import taa_resolve

        velocity = gbuf["velocity"].reshape(height, width, 2)
        depth = gbuf["depth"].reshape(height, width)
        prev = hdr if taa_history is None else taa_history
        hdr = taa_resolve(hdr, prev, velocity, depth)
        new_history = hdr

    if use_dof:
        from ..ops.dof import depth_of_field

        view_depth = jnp.maximum(-gbuf["z_cam"].reshape(height, width), 1e-3)
        hdr = depth_of_field(hdr, view_depth, cam)

    img = tone_map(hdr, lut, exposure, contrast)
    return img, new_history


def deferred_entry(
    *,
    static,
    frame,
    arena,
    cam,
    lut,
    width,
    height,
    exposure=1.0,
    contrast=1.0,
    state=None,
    use_taa=False,
    use_bloom=False,
    use_dof=False,
    **kwargs,
):
    img, history = render_deferred(
        static,
        frame,
        arena,
        cam,
        lut,
        width,
        height,
        exposure,
        contrast,
        use_taa,
        use_bloom,
        use_dof,
        taa_history=state,
        ibl_data=kwargs.get("ibl_data"),
        use_culling=kwargs.get("use_culling", False),
    )
    return img, history
