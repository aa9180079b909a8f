"""Meshlet culling pipeline: culling must never change the image
(invariance), and must actually cull (effectiveness)."""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.ops import culling, hiz
from prosper_tpu.testing import make_test_scene


def _dev(tree):
    return {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in tree.items()
    }


def _setup(width=64, height=64):
    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    cam = {k: jnp.asarray(v) for k, v in cam_fn(width, height).items()}
    scales = jnp.ones(1, jnp.float32)
    return _dev(static), _dev(frame), _dev(arena), cam, scales


def test_frustum_cull_keeps_visible_boxes():
    width = height = 64
    static, frame, arena, cam, scales = _setup(width, height)
    res = culling.cull_clusters(
        static, frame, cam, scales, [], width, height
    )
    vis = np.asarray(res["visible"])
    # camera looks at the grid center: all four boxes visible
    assert vis.all()
    assert int(res["drawn_meshlets"]) == 4
    assert int(res["rasterized_triangles"]) == 48


def test_frustum_cull_drops_behind_camera():
    width = height = 64
    static, frame, arena, cam, scales = _setup(width, height)
    # move every box far behind the camera's view direction
    import numpy as np_

    static2 = dict(static)
    static2["wc_sphere_center"] = static["wc_sphere_center"] + jnp.asarray(
        np_.array([100.0, 0, 100.0], np_.float32)
    )
    res = culling.cull_clusters(static2, frame, cam, scales, [], width, height)
    assert not np.asarray(res["visible"]).any()
    assert int(res["drawn_meshlets"]) == 0


def test_cone_cull_backfacing_cluster():
    width = height = 64
    static, frame, arena, cam, scales = _setup(width, height)
    static2 = dict(static)
    # cluster 0: a cone pointing away from the camera with tight cutoff
    eye = np.asarray(cam["eye"])
    c = np.asarray(static["wc_sphere_center"])[0]
    away = (c - eye) / np.linalg.norm(c - eye)
    axes = np.asarray(static["wc_cone_axis"]).copy()
    cutoffs = np.asarray(static["wc_cone_cutoff"]).copy()
    axes[0] = away
    cutoffs[0] = 0.1
    # shrink radius so the cone test can fire (radius pushes the bound)
    radii = np.asarray(static["wc_sphere_radius"]).copy()
    radii[0] = 0.01
    static2["wc_cone_axis"] = jnp.asarray(axes)
    static2["wc_cone_cutoff"] = jnp.asarray(cutoffs)
    static2["wc_sphere_radius"] = jnp.asarray(radii)
    res = culling.cull_clusters(static2, frame, cam, scales, [], width, height)
    vis = np.asarray(res["visible"])
    assert not vis[0]
    assert vis[1:].all()


def test_hiz_occlusion_culls_hidden_cluster():
    width = height = 64
    static, frame, arena, cam, scales = _setup(width, height)
    # full-near depth buffer: everything is occluded by a near plane
    depth_near = jnp.full((height, width), 0.999)
    mips = hiz.build_hiz(depth_near, width, height)
    res = culling.cull_clusters(static, frame, cam, scales, mips, width, height,
                                output_second_phase=True)
    assert not np.asarray(res["visible"]).any()
    # occluded clusters land in the second-phase list
    assert int(res["second_phase_count"]) == 4

    # far depth buffer (reverse-z 0 = far): nothing is occluded
    depth_far = jnp.zeros((height, width))
    mips = hiz.build_hiz(depth_far, width, height)
    res = culling.cull_clusters(static, frame, cam, scales, mips, width, height)
    assert np.asarray(res["visible"]).all()


def test_hiz_pyramid_properties():
    depth = jnp.asarray(
        np.random.default_rng(0).random((48, 72), dtype=np.float32)
    )
    mips = hiz.build_hiz(depth, 72, 48)
    # mip0 is pow2-rounded half res
    assert mips[0].shape == (32, 64)
    # reverse-z min: every mip value <= the max of the finer mip
    for a, b in zip(mips[:-1], mips[1:]):
        ha, wa = a.shape
        blocks = a[: b.shape[0] * 2, : b.shape[1] * 2].reshape(
            b.shape[0], 2, b.shape[1], 2
        )
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(blocks.min(axis=(1, 3))), atol=0
        )
    # global min preserved at the tip
    assert np.isclose(float(mips[-1].min()), float(mips[0].min()))
