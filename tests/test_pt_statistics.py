"""Path-tracer statistical checks (SURVEY §4: statistical tests for the
Monte-Carlo parts)."""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.ops.texture import pack_material_tables
from prosper_tpu.render.pt import pt_render_sample
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


def test_pt_furnace_like_energy():
    """White diffuse scene in a uniform unit environment: accumulated
    radiance must land near 1 (bounded below by bounce truncation, above
    by the reference BRDF's slight non-conservation)."""
    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    static, frame, arena = _dev(static), _dev(frame), _dev(arena)
    mats = {k: np.array(v) for k, v in static["materials"].items()}
    mats["base_color_factor"][:] = [1, 1, 1, 1]
    mats["metallic_factor"][:] = 0.0
    mats["roughness_factor"][:] = 0.8
    static = dict(static)
    static["materials"] = {k: jnp.asarray(v) for k, v in mats.items()}
    arena = dict(arena)
    arena["mat_f32"], arena["mat_i32"] = pack_material_tables(
        static["materials"], arena
    )
    # kill the analytic lights; uniform env only
    lights = {k: np.array(v) for k, v in frame["lights"].items()}
    lights["dir_irradiance"] = np.zeros(3, np.float32)
    lights["point_count"] = np.int32(0)
    lights["packed_rows"][:] = 0
    frame = dict(frame)
    frame["lights"] = {k: jnp.asarray(v) for k, v in lights.items()}

    env = jnp.ones((6, 8, 8, 3), jnp.float32)
    W = H = 32
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}

    acc = np.zeros((H * W, 3), np.float64)
    n_frames = 12
    for i in range(n_frames):
        c = pt_render_sample(
            static, frame, arena, cam, W, H, i, max_bounces=5, env=env
        )
        acc += np.asarray(c, np.float64)
    mean_img = acc / n_frames

    # every pixel converges toward the furnace value 1
    m = float(mean_img.mean())
    assert 0.75 < m < 1.35, m
    # background pixels (pure env) are exactly 1
    # find rays that miss everything: corner pixels look past the boxes
    corner = mean_img.reshape(H, W, 3)[0, 0]
    np.testing.assert_allclose(corner, 1.0, atol=1e-5)


def test_pt_deterministic_given_frame_index():
    static, frame, arena, cam_fn = make_test_scene()
    static, frame, arena = _dev(static), _dev(frame), _dev(arena)
    arena = dict(arena)
    arena["mat_f32"], arena["mat_i32"] = pack_material_tables(
        static["materials"], arena
    )
    W = H = 16
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    a = pt_render_sample(static, frame, arena, cam, W, H, 7, max_bounces=2)
    b = pt_render_sample(static, frame, arena, cam, W, H, 7, max_bounces=2)
    c = pt_render_sample(static, frame, arena, cam, W, H, 8, max_bounces=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
