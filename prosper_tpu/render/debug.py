"""Debug visualisation: draw-type AOVs, the TextureDebug viewer analog,
and CPU debug line rasterisation.

Parity:
- DrawType enum /root/reference/src/scene/DrawType.hpp:8-12 (Default,
  PrimitiveID, MeshletID, MeshID, MaterialID, Position, ShadingNormal,
  TexCoord0, Albedo, Roughness, Metallic)
- commonDebugDraw mapping (res/shader/debug.glsl:17-38) incl. the pcg
  pastel hash colors for IDs (common/random.glsl uintToColor)
- TextureDebug (src/render/TextureDebug.*): any intermediate array
  viewable with channel/range controls — here `dump_texture` writes the
  normalized channels to PNG/NPY (headless equivalent of markForDebug)
- DebugRenderer (src/render/DebugRenderer.*): CPU line lists (<=100k,
  DebugGeometry.hpp:13-20) rasterised over the frame
"""

from __future__ import annotations

from enum import IntEnum

import jax.numpy as jnp
import numpy as np

from ..mathx.rng import uint_to_color


class DrawType(IntEnum):
    DEFAULT = 0
    PRIMITIVE_ID = 1
    MESHLET_ID = 2
    MESH_ID = 3
    MATERIAL_ID = 4
    POSITION = 5
    SHADING_NORMAL = 6
    TEXCOORD0 = 7
    ALBEDO = 8
    ROUGHNESS = 9
    METALLIC = 10


DRAW_TYPE_NAMES = [t.name.lower() for t in DrawType]


def debug_color(
    draw_type: DrawType,
    surface: dict,
    hit: dict,
    static_scene: dict,
) -> jnp.ndarray:
    """(R, 3) debug AOV per commonDebugDraw; magenta for unknown."""
    tri = jnp.maximum(hit["tri"], 0).astype(jnp.uint32)
    meshlet = tri // 128
    if draw_type == DrawType.PRIMITIVE_ID:
        return uint_to_color(tri)
    if draw_type == DrawType.MESHLET_ID:
        return uint_to_color(meshlet)
    if draw_type == DrawType.MESH_ID:
        mesh = static_scene["wc_instance"][meshlet.astype(jnp.int32)].astype(jnp.uint32)
        return uint_to_color(mesh)
    if draw_type == DrawType.MATERIAL_ID:
        return uint_to_color(surface["material"].astype(jnp.uint32))
    if draw_type == DrawType.POSITION:
        return surface["position_ws"]
    if draw_type == DrawType.SHADING_NORMAL:
        return surface["normal_ws"] * 0.5 + 0.5
    if draw_type == DrawType.TEXCOORD0:
        return jnp.concatenate(
            [surface["uv"], jnp.zeros_like(surface["uv"][..., :1])], -1
        )
    if draw_type == DrawType.ALBEDO:
        return surface["albedo"]
    if draw_type == DrawType.ROUGHNESS:
        return jnp.broadcast_to(
            surface["roughness"][..., None], surface["albedo"].shape
        )
    if draw_type == DrawType.METALLIC:
        return jnp.broadcast_to(
            surface["metallic"][..., None], surface["albedo"].shape
        )
    return jnp.broadcast_to(jnp.array([1.0, 0.0, 1.0]), surface["albedo"].shape)


# ---------------------------------------------------------------------------
# TextureDebug analog


def dump_texture(
    img,
    path: str,
    channel: str = "rgb",
    lo: float | None = None,
    hi: float | None = None,
) -> None:
    """Write any intermediate array as a normalized PNG (+ raw NPY).

    channel: 'rgb' | 'r' | 'g' | 'b' | 'a' — like the TextureDebug
    channel dropdown; lo/hi the range sliders (None = min/max).
    """
    from ..io.image import write_npy, write_png

    a = np.asarray(img)
    write_npy(path + ".npy", a)
    if a.ndim == 2:
        a = a[..., None]
    idx = {"r": 0, "g": 1, "b": 2, "a": 3}
    if channel in idx:
        c = min(idx[channel], a.shape[-1] - 1)
        a = a[..., c : c + 1].repeat(3, axis=-1)
    else:
        if a.shape[-1] == 1:
            a = a.repeat(3, axis=-1)
        a = a[..., :3]
    lo = float(np.nanmin(a)) if lo is None else lo
    hi = float(np.nanmax(a)) if hi is None else hi
    scale = 1.0 / max(hi - lo, 1e-20)
    write_png(path, np.clip((a - lo) * scale, 0, 1))


# ---------------------------------------------------------------------------
# DebugRenderer analog: CPU line lists composited over the frame

MAX_DEBUG_LINES = 100_000  # DebugGeometry.hpp:13-20


class DebugLines:
    """Per-frame line list (addLine analog)."""

    def __init__(self) -> None:
        self.starts: list[np.ndarray] = []
        self.ends: list[np.ndarray] = []
        self.colors: list[np.ndarray] = []

    def add_line(self, p0, p1, color) -> None:
        if len(self.starts) >= MAX_DEBUG_LINES:
            return
        self.starts.append(np.asarray(p0, np.float32))
        self.ends.append(np.asarray(p1, np.float32))
        self.colors.append(np.asarray(color, np.float32))

    def add_frustum(self, corners: dict, color) -> None:
        """Frozen-frustum debug wireframe (App.cpp:1086-1156)."""
        c = corners
        for a, b in [
            ("bln", "brn"), ("brn", "trn"), ("trn", "tln"), ("tln", "bln"),
            ("blf", "brf"), ("brf", "trf"), ("trf", "tlf"), ("tlf", "blf"),
            ("bln", "blf"), ("brn", "brf"), ("trn", "trf"), ("tln", "tlf"),
        ]:
            self.add_line(c[a], c[b], color)

    def clear(self) -> None:
        self.starts, self.ends, self.colors = [], [], []

    def rasterize_over(self, img: np.ndarray, cam: dict) -> np.ndarray:
        """Project lines with the camera and draw over an (H, W, 3) image."""
        if not self.starts:
            return img
        img = np.array(img, copy=True)
        h, w = img.shape[:2]
        m = np.asarray(cam["world_to_clip"])

        def project(p):
            v = m @ np.append(p, 1.0)
            if v[3] <= 1e-6:
                return None
            ndc = v[:3] / v[3]
            return np.array(
                [(ndc[0] * 0.5 + 0.5) * w, (ndc[1] * 0.5 + 0.5) * h]
            )

        for p0, p1, c in zip(self.starts, self.ends, self.colors):
            a, b = project(p0), project(p1)
            if a is None or b is None:
                continue
            n = int(max(np.abs(b - a).max(), 1))
            ts = np.linspace(0, 1, min(n + 1, 4096))
            pts = a[None] + (b - a)[None] * ts[:, None]
            xs = np.clip(pts[:, 0].astype(int), 0, w - 1)
            ys = np.clip(pts[:, 1].astype(int), 0, h - 1)
            img[ys, xs] = c
        return img
