"""Per-frame device-dispatch budget — the eager-tail regression guard.

Round 4's ReSTIR frame silently regressed 200 -> 318 ms because ~50
eager accumulation/tone-map dispatches rode outside the jit: every
pixel stayed correct, so no test failed while the frame serialized
through host dispatch latency. This suite counts actual XLA module
executions for ONE steady-state frame of each mode (warmed state, so
no compile, no first-frame init) and fails when a frame exceeds its
budget — the way the reference enforces one vkQueueSubmit per frame
(/root/reference/src/App.cpp:1178-1181).

Budgets = measured count + small headroom (measured on the 8-device
CPU conftest mesh, round 5: pt 3, deferred 2, restir 3, forward 2 —
render jit + fused accumulate/tonemap tail + the forcing mean).
Raising a budget is a deliberate act with a number attached, not a
silent drift.
"""

from __future__ import annotations

import jax.numpy as jnp
import pytest

from prosper_tpu.render.frame import render_modes
from prosper_tpu.testing import make_test_scene
from prosper_tpu.utils.dispatch_count import count_dispatches

BUDGETS = {"pt": 5, "deferred": 4, "restir": 5, "forward": 4,
           "deferred_full": 4}  # full post chain: taa+bloom+dof+particles
# (measured 2 — the whole chain fuses into the frame jit)
EXTRA_KW = {
    "deferred_full": dict(
        use_taa=True, use_bloom=True, use_dof=True, use_particles=True
    ),
}
MODE_OF = {"deferred_full": "deferred"}
W = H = 64


def _dev(d):
    return {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in d.items()
        if k not in ("scene_camera", "bvh_depth")
    }


@pytest.fixture(scope="module")
def scene():
    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    lut = jnp.tile(
        jnp.linspace(0, 1, 48, dtype=jnp.float32)[None, None, :, None],
        (48, 48, 1, 3),
    )
    return _dev(static), _dev(frame), _dev(arena), cam, lut


@pytest.mark.parametrize("mode", sorted(BUDGETS))
def test_steady_state_frame_dispatch_budget(scene, mode):
    s, f, a, cam, lut = scene
    render = render_modes()[MODE_OF.get(mode, mode)]
    kw = EXTRA_KW.get(mode, {})
    state = None
    for i in range(3):  # compile + leave warmed state (accum/TAA history)
        img, state = render(
            static=s, frame=f, arena=a, cam=cam, lut=lut,
            width=W, height=H, frame_index=i, state=state, max_bounces=2,
            **kw,
        )
        float(img.mean())
    out = {}
    with count_dispatches(out):
        img, state = render(
            static=s, frame=f, arena=a, cam=cam, lut=lut,
            width=W, height=H, frame_index=3, state=state, max_bounces=2,
            **kw,
        )
        float(img.mean())  # the forcing mean counts; budgets include it
    assert out["n"] <= BUDGETS[mode], (
        f"{mode}: {out['n']} device dispatches in a steady-state frame "
        f"(budget {BUDGETS[mode]}) — an eager tail has crept outside the "
        f"frame jit; fuse it (see render/pt._accum_tonemap) or justify a "
        f"budget bump here with the new measured count"
    )
