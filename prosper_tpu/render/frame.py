"""Frame-graph dispatch: mode name -> unified render callable.

The TPU analog of Renderer::render's mode flags
(/root/reference/src/render/Renderer.cpp:367-670, Renderer.hpp:107-117):
each mode is a jit-compiled functional frame graph
`f(static, frame, arena, cam, lut, ...) -> (image, state)` where `state`
is the persistent FrameState pytree (accumulation buffers, TAA history —
the preserve()d resources of the reference).
"""

from __future__ import annotations

from .forward import render_forward


def _forward_entry(
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
    draw_type=0,
    use_transparent=False,
    **kw,
):
    from ..utils.profiler import profiled_jit_call

    img = profiled_jit_call(
        render_forward,
        static, frame, arena, cam, lut, width, height, exposure, contrast,
        draw_type, use_transparent,
        alpha_rounds=kw.get("alpha_rounds", 0),
        aniso_taps=kw.get("aniso_taps", 1),
    )
    return img, state


def render_modes() -> dict:
    modes = {"forward": _forward_entry}
    try:
        from .pt import pt_entry

        modes["pt"] = pt_entry
    except ImportError:
        pass
    try:
        from .deferred import deferred_entry

        modes["deferred"] = deferred_entry
    except ImportError:
        pass
    try:
        from .restir import restir_entry

        modes["restir"] = restir_entry
    except ImportError:
        pass
    return modes
