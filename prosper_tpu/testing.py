"""Procedural test scenes: tiny self-contained scene pytrees for unit
tests, the graft entry, and sharding dry-runs (no glTF file needed)."""

from __future__ import annotations

import numpy as np

from .accel.bvh import build_bvh, pack_nodes
from .scene.camera import Camera, CameraParameters, CameraTransform
from .scene.lights import LightArrays, light_uniforms
from .scene.meshlets import CLUSTER_TRI_PAD


def make_test_scene(n_boxes: int = 4, seed: int = 0):
    """A grid of axis-aligned boxes (12 tris each), one cluster per box.

    Returns (static, frame, arena, cam_fn) where cam_fn(w, h) builds
    camera uniforms looking at the grid.
    """
    rng = np.random.default_rng(seed)
    pad = CLUSTER_TRI_PAD

    # unit cube triangles
    corners = np.array(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.float32
    )
    faces = [
        (0, 1, 3, 2),  # x=0
        (4, 6, 7, 5),  # x=1
        (0, 4, 5, 1),  # y=0
        (2, 3, 7, 6),  # y=1
        (0, 2, 6, 4),  # z=0
        (1, 5, 7, 3),  # z=1
    ]
    tris = []
    for a, b, c, d in faces:
        tris.append((a, b, c))
        tris.append((a, c, d))
    tris = np.array(tris, np.int32)

    n_clusters = n_boxes
    S = n_clusters * pad
    wt_p0 = np.zeros((S, 3), np.float32)
    wt_p1 = np.zeros((S, 3), np.float32)
    wt_p2 = np.zeros((S, 3), np.float32)
    wt_aidx = np.zeros((S, 3), np.int32)
    wc_min = np.zeros((n_clusters, 3), np.float32)
    wc_max = np.zeros((n_clusters, 3), np.float32)

    a_normal = []
    a_tangent = []
    a_uv = []
    v_off = 0
    for b in range(n_boxes):
        origin = np.array([(b % 2) * 2.0 - 1.0, 0.0, (b // 2) * 2.0 - 1.0]) * 1.5
        verts = corners * 0.8 + origin
        base = b * pad
        wt_p0[base : base + 12] = verts[tris[:, 0]]
        wt_p1[base : base + 12] = verts[tris[:, 1]]
        wt_p2[base : base + 12] = verts[tris[:, 2]]
        wt_aidx[base : base + 12] = tris + v_off
        wc_min[b] = verts.min(axis=0)
        wc_max[b] = verts.max(axis=0)
        n = verts - verts.mean(axis=0)
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        a_normal.append(n.astype(np.float32))
        t = np.cross(np.array([0.0, 1.0, 0.0]), n)
        t /= np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-9)
        a_tangent.append(
            np.concatenate([t, np.ones((8, 1))], axis=1).astype(np.float32)
        )
        a_uv.append(rng.random((8, 2), dtype=np.float32))
        v_off += 8

    materials = {
        "base_color_factor": np.array(
            [[1, 1, 1, 1], [0.8, 0.4, 0.3, 1.0]], np.float32
        ),
        "metallic_factor": np.array([1.0, 0.1], np.float32),
        "roughness_factor": np.array([1.0, 0.7], np.float32),
        "alpha_cutoff": np.array([0.5, 0.5], np.float32),
        "alpha_mode": np.array([0, 0], np.int32),
        "base_color_tex": np.array([0, 0], np.int32),
        "metallic_roughness_tex": np.array([0, 0], np.int32),
        "normal_tex": np.array([0, 0], np.int32),
    }

    wc_center = (wc_min + wc_max) / 2
    wc_radius = np.linalg.norm(wc_max - wc_center, axis=1).astype(np.float32)
    static = {
        "wc_instance": np.zeros(n_clusters, np.int32),
        "wc_material": np.ones(n_clusters, np.int32),
        "wc_sphere_center": wc_center.astype(np.float32),
        "wc_sphere_radius": wc_radius,
        "wc_cone_axis": np.tile(np.array([[0, 0, 1.0]], np.float32), (n_clusters, 1)),
        "wc_cone_cutoff": np.ones(n_clusters, np.float32),  # never cone-cull
        "wc_tri_count": np.full(n_clusters, 12, np.int32),
        "wt_p0": wt_p0,
        "wt_p1": wt_p1,
        "wt_p2": wt_p2,
        "wt_aidx": wt_aidx,
        "wt_instance": np.zeros(S, np.int32),
        "wt_material": np.ones(S, np.int32),
        "a_packed": np.concatenate(
            [
                np.concatenate(
                    [n, t, uv, np.zeros((len(n), 3), np.float32)], axis=1
                )
                for n, t, uv in zip(a_normal, a_tangent, a_uv)
            ]
        ),
        "materials": materials,
    }

    bvh = build_bvh(wc_min, wc_max, max_leaf_size=1)
    lights = LightArrays()
    lights.point_radiance[0] = [30.0, 25.0, 20.0]
    lights.point_position[0] = [0.0, 3.0, 0.0]
    lights.point_radius[0] = 50.0
    lights.point_count = 1

    frame = {
        "wc_aabb_min_w": wc_min,
        "wc_aabb_max_w": wc_max,
        "transforms": np.eye(4, dtype=np.float32)[None, :3, :4],
        "normal_transforms": np.eye(3, dtype=np.float32)[None],
        "bvh_bounds": pack_nodes(bvh)[0],
        "bvh_meta": pack_nodes(bvh)[1],
        "lights": light_uniforms(lights),
    }

    # 1px white default texture arena (quad layout)
    arena = {
        "data": np.full((1, 4), 0xFFFFFFFF, np.uint32),
        "table": np.zeros((1, 13, 4), np.int32)
        + np.array([0, 1, 1, 0], np.int32)[None, None, :],
        "n_mips": np.ones(1, np.int32),
    }

    def cam_fn(width: int, height: int) -> dict:
        cam = Camera(
            (width, height),
            CameraParameters(),
            CameraTransform(
                eye=np.array([4.0, 3.5, 4.5], np.float32),
                target=np.array([0.0, 0.3, 0.0], np.float32),
                up=np.array([0.0, 1.0, 0.0], np.float32),
            ),
        )
        return cam.uniforms()

    return static, frame, arena, cam_fn


def make_stress_scene(n_clusters: int = 2048, seed: int = 0):
    """Sponza-class synthetic stress scene: n_clusters plates of 128
    triangles each (8x8 quad grids), scattered in a 3D grid — >=100k
    tris at 1024+ clusters, exercising the BVH traversal path at scale
    (BASELINE config 2 intent; the Sponza asset is absent from the
    mount). Returns (tris_dict, wc_min, wc_max, bvh_bounds, bvh_meta).
    """
    rng = np.random.default_rng(seed)
    pad = CLUSTER_TRI_PAD
    g = 8  # 8x8 quads -> 128 tris, a full cluster

    side = int(np.ceil(n_clusters ** (1.0 / 3.0)))
    S = n_clusters * pad
    p0 = np.zeros((S, 3), np.float32)
    p1 = np.zeros((S, 3), np.float32)
    p2 = np.zeros((S, 3), np.float32)
    wc_min = np.zeros((n_clusters, 3), np.float32)
    wc_max = np.zeros((n_clusters, 3), np.float32)

    # one plate's local grid (g*g quads = 2*g*g tris = 128)
    xs, ys = np.meshgrid(np.arange(g + 1), np.arange(g + 1), indexing="ij")
    verts = np.stack(
        [xs.ravel() / g, ys.ravel() / g, np.zeros((g + 1) * (g + 1))], 1
    ).astype(np.float32)
    quads = []
    for i in range(g):
        for j in range(g):
            a = i * (g + 1) + j
            b = a + 1
            c = a + (g + 1)
            d = c + 1
            quads += [(a, b, c), (b, d, c)]
    tris_local = np.array(quads, np.int32)

    for ci in range(n_clusters):
        cell = np.array(
            [ci % side, (ci // side) % side, ci // (side * side)], np.float32
        )
        origin = cell * 1.5 + rng.uniform(-0.2, 0.2, 3)
        rot = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
        v = verts @ rot.T + origin
        base = ci * pad
        p0[base : base + 128] = v[tris_local[:, 0]]
        p1[base : base + 128] = v[tris_local[:, 1]]
        p2[base : base + 128] = v[tris_local[:, 2]]
        wc_min[ci] = v.min(axis=0)
        wc_max[ci] = v.max(axis=0)

    tris = {"v0": p0, "e1": p1 - p0, "e2": p2 - p0}
    bvh = build_bvh(wc_min, wc_max, max_leaf_size=1)
    bounds, meta = pack_nodes(bvh)
    return tris, wc_min, wc_max, bounds, meta
