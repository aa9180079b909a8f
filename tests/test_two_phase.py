"""Two-phase occlusion culling invariance: the culled G-buffer must equal
the uncull G-buffer regardless of the previous frame's HiZ."""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.ops import hiz
from prosper_tpu.render.gbuffer import render_gbuffer
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


def test_two_phase_matches_uncull():
    width = height = 64
    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    static, frame, arena = _dev(static), _dev(frame), _dev(arena)
    cam = {k: jnp.asarray(v) for k, v in cam_fn(width, height).items()}

    base = render_gbuffer(static, frame, arena, cam, width, height)

    # adversarial previous HiZ: everything reads as occluded (all-near)
    prev = hiz.build_hiz(jnp.full((height, width), 0.999), width, height)
    culled = render_gbuffer(
        static, frame, arena, cam, width, height,
        use_culling=True, prev_hiz=prev,
    )
    np.testing.assert_allclose(
        np.asarray(culled["depth"]), np.asarray(base["depth"]), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(culled["valid"]), np.asarray(base["valid"])
    )

    # no prev HiZ at all (first frame)
    culled0 = render_gbuffer(
        static, frame, arena, cam, width, height, use_culling=True
    )
    np.testing.assert_allclose(
        np.asarray(culled0["depth"]), np.asarray(base["depth"]), atol=1e-6
    )
    assert int(culled0["draw_stats"]["drawn_meshlets"]) >= 1
