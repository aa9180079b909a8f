"""Tile-major clustered shading kernel (ops/shade_tiles.py) vs the XLA
froxel-list path (ops/clustering.py), interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.ops import clustering
from prosper_tpu.ops.rays import pinhole_rays
from prosper_tpu.scene.camera import Camera, CameraParameters, CameraTransform
from prosper_tpu.scene.lights import LightArrays, light_uniforms
from tests.test_trace_bvh import interpret_mode


def _make_case(width=96, height=64, n_point=40, n_spot=6, seed=0):
    rng = np.random.default_rng(seed)
    cam_obj = Camera(
        (width, height),
        CameraParameters(),
        CameraTransform(
            eye=np.array([0.0, 1.0, 6.0], np.float32),
            target=np.array([0.0, 0.0, 0.0], np.float32),
            up=np.array([0.0, 1.0, 0.0], np.float32),
        ),
    )
    cam = {k: jnp.asarray(v) for k, v in cam_obj.uniforms().items()}

    la = LightArrays()
    la.point_count = n_point
    la.point_position[:n_point] = rng.uniform(-6, 6, (n_point, 3))
    la.point_radiance[:n_point] = rng.uniform(0.5, 8.0, (n_point, 3))
    la.point_radius[:n_point] = rng.uniform(1.0, 8.0, n_point)
    la.spot_count = n_spot
    la.spot_position[:n_spot] = rng.uniform(-5, 5, (n_spot, 3))
    la.spot_radiance[:n_spot] = rng.uniform(0.5, 6.0, (n_spot, 3))
    la.spot_angle_scale[:n_spot] = rng.uniform(1.0, 4.0, n_spot)
    la.spot_angle_offset[:n_spot] = rng.uniform(-1.0, 0.0, n_spot)
    d = rng.normal(size=(n_spot, 3))
    la.spot_direction[:n_spot] = d / np.linalg.norm(d, axis=1, keepdims=True)
    lights = {k: jnp.asarray(v) for k, v in light_uniforms(la).items()}

    # surface points along actual pixel rays so froxel x/y assignment
    # matches between the pixel-indexed and tile-indexed paths
    R = width * height
    px = jnp.tile(jnp.arange(width, dtype=jnp.int32), height)
    py = jnp.repeat(jnp.arange(height, dtype=jnp.int32), width)
    uv = (jnp.stack([px, py], -1).astype(jnp.float32) + 0.5) / jnp.array(
        [width, height], jnp.float32
    )
    o, dirs = pinhole_rays(cam, uv)
    depth = jnp.asarray(rng.uniform(1.0, 14.0, R).astype(np.float32))
    pos = o + dirs * depth[:, None]

    n = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    n = n / jnp.linalg.norm(n, axis=1, keepdims=True)
    inv_view = cam["eye"] - pos
    inv_view = inv_view / jnp.maximum(
        jnp.linalg.norm(inv_view, axis=-1, keepdims=True), 1e-20
    )
    surface = {
        "position_ws": pos,
        "normal_ws": n,
        "inv_view_ray": inv_view,
        "albedo": jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32)),
        "roughness": jnp.asarray(rng.uniform(0.05, 1, R).astype(np.float32)),
        "metallic": jnp.asarray(rng.uniform(0, 1, R).astype(np.float32)),
        "NoV": jnp.clip(jnp.sum(n * inv_view, axis=-1), 0.0, 1.0),
    }
    # view-space z of the surface point
    w2c = cam["world_to_camera"]
    z_cam = pos @ w2c[2, :3] + w2c[2, 3]
    valid = jnp.asarray(rng.random(R) > 0.1)
    return cam, lights, surface, z_cam, valid, px, py, width, height


def test_tile_kernel_matches_froxel_path():
    (cam, lights, surface, z_cam, valid, px, py, width, height) = _make_case()

    clusters = clustering.build_light_clusters(cam, lights, width, height)
    want = clustering.eval_clustered_lights(
        surface, lights, clusters, px, py, z_cam, cam["near"], cam["far"]
    )
    want = np.where(np.asarray(valid)[:, None], np.asarray(want), 0.0)

    from prosper_tpu.ops.shade_tiles import shade_clustered_tiles

    with interpret_mode():
        got = shade_clustered_tiles(
            surface, lights, cam, z_cam, valid, width, height
        )
    got = np.asarray(got)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tile_roundtrip():
    from prosper_tpu.ops.shade_tiles import from_tiles, to_tiles

    rng = np.random.default_rng(1)
    w, h = 70, 41  # non-multiples of 32
    x = jnp.asarray(rng.normal(size=(w * h, 5)).astype(np.float32))
    back = from_tiles(to_tiles(x, w, h), w, h)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
