"""G-buffer generation via primary-visibility ray casting.

The reference rasterises meshlets into albedo+roughness / signed-oct
normal+metalness / velocity / depth targets
(/root/reference/res/shader/gbuffer.frag, formats RenderTargets.hpp:11-14).
On TPU primary visibility comes from the same cluster tracer; the
G-buffer encodings are kept bit-compatible:
- albedoRoughness: rgb albedo + a roughness
- normalMetallic: signed-octahedron normal (xy + z sign) + metalness
- velocity: NDC motion with jitter removed, y negated, clamped [-1,1]
  (gbuffer.frag:74-84)
- depth: reverse-z non-linear depth (D32 analog)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..mathx.packing import pack_velocity, signed_oct_encode
from ..ops import trace
from ..ops.rays import pinhole_rays
from .surface import evaluate_surface


def render_gbuffer(
    static_scene: dict,
    frame: dict,
    arena: dict,
    cam: dict,
    width: int,
    height: int,
):
    """Trace primary rays and produce the G-buffer pytree (flat R = W*H)."""
    px_np, py_np, inv_np = trace.block_pixel_order(width, height)
    uv = jnp.stack(
        [
            (jnp.asarray(px_np).astype(jnp.float32) + 0.5) / width,
            (jnp.asarray(py_np).astype(jnp.float32) + 0.5) / height,
        ],
        axis=-1,
    )
    # jittered projection: the jitter rides the camera matrix; rays go
    # through pixel centers shifted by the jitter like the raster path
    jit = cam["current_jitter"]
    uv_j = uv + jit * jnp.array([0.5, -0.5])  # NDC jitter -> uv units
    o, d = pinhole_rays(cam, uv_j)

    tris = trace.world_triangles(static_scene, frame)
    closest_fn, _ = trace.make_tracer(
        tris, frame["wc_aabb_min_w"], frame["wc_aabb_max_w"]
    )
    hit = closest_fn(o, d, 1e-4, jnp.inf)
    inv = jnp.asarray(inv_np)
    hit = {k: v[inv] for k, v in hit.items()}
    o = o[inv]
    d = d[inv]
    surface = evaluate_surface(static_scene, frame, arena, o, d, hit)
    valid = surface["valid"]

    pos = surface["position_ws"]
    pos_safe = jnp.where(valid[..., None], pos, 0.0)

    # current and previous clip positions for velocity (gbuffer.frag:74-84)
    def project(m, p):
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        clip = ph @ m.T
        return clip[..., :3] / jnp.maximum(jnp.abs(clip[..., 3:4]), 1e-20) * jnp.sign(
            clip[..., 3:4]
        )

    ndc = project(cam["world_to_clip"], pos_safe)
    prev_ndc = project(cam["prev_world_to_clip"], pos_safe)
    velocity = (ndc[..., :2] - cam["current_jitter"]) - (
        prev_ndc[..., :2] - cam["previous_jitter"]
    )
    velocity = velocity.at[..., 1].multiply(-1.0)
    velocity = pack_velocity(velocity)

    # view-space z for froxel lookup
    w2c = cam["world_to_camera"]
    z_cam = pos_safe @ w2c[2, :3] + w2c[2, 3]

    gbuf = {
        "albedo_roughness": jnp.concatenate(
            [surface["albedo"], surface["roughness"][..., None]], axis=-1
        ),
        "normal_metallic": jnp.concatenate(
            [
                signed_oct_encode(surface["normal_ws"]),
                surface["metallic"][..., None],
            ],
            axis=-1,
        ),
        "velocity": jnp.where(valid[..., None], velocity, 0.0),
        "depth": jnp.where(valid, ndc[..., 2], 0.0),  # reverse-z: far = 0
        "z_cam": jnp.where(valid, z_cam, -jnp.inf),
        "position_ws": pos_safe,
        "valid": valid,
        # carried for shading without re-deriving from encodings (the
        # deferred shader decodes; tests assert the encodings round-trip)
        "surface": surface,
    }
    return gbuf
