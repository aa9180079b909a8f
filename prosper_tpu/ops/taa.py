"""Temporal anti-aliasing resolve.

Parity with /root/reference/res/shader/taa_resolve.comp and the defaults
in TemporalAntiAliasing.hpp:81-84 (Variance clip, Closest velocity,
Catmull-Rom history, luminance weighting):
- 3x3 min-max / Salvi variance color clipping
- center / largest / closest (max reverse-z depth) velocity sampling
- Jimenez 5-tap optimized Catmull-Rom history fetch (sharpness 70)
- reprojection uv = uv - velocity * (0.5, -0.5); off-screen -> passthrough
- blend 0.1 current with 1/(1+luma) weighting

All images are (H, W, C) jnp arrays; variants are static Python flags
(the specialization-constant analog, ComputePass permutations).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..mathx.color import luminance


def _shifts_3x3(img: jnp.ndarray):
    """9 edge-padded shifted copies, (9, H, W, C)."""
    padded = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    h, w = img.shape[:2]
    outs = []
    for dy in range(3):
        for dx in range(3):
            outs.append(padded[dy : dy + h, dx : dx + w])
    return jnp.stack(outs)


def min_max_clip(illum: jnp.ndarray, prev: jnp.ndarray) -> jnp.ndarray:
    n = _shifts_3x3(illum)
    return jnp.clip(prev, n.min(axis=0), n.max(axis=0))


def variance_clip(illum: jnp.ndarray, prev: jnp.ndarray) -> jnp.ndarray:
    n = _shifts_3x3(illum)
    m1 = n.sum(axis=0) / 9.0
    m2 = (n * n).sum(axis=0) / 9.0
    sigma = jnp.sqrt(jnp.maximum(m2 - m1 * m1, 0.0))
    return jnp.clip(prev, m1 - sigma, m1 + sigma)


def closest_velocity(velocity: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Velocity of the 3x3 neighbor with max reverse-z depth."""
    d = _shifts_3x3(depth[..., None])[..., 0]  # (9, H, W)
    v = _shifts_3x3(velocity)  # (9, H, W, 2)
    best = jnp.argmax(d, axis=0)  # (H, W)
    return jnp.take_along_axis(v, best[None, ..., None], axis=0)[0]


def largest_velocity(velocity: jnp.ndarray) -> jnp.ndarray:
    v = _shifts_3x3(velocity)
    len2 = jnp.sum(v * v, axis=-1)
    best = jnp.argmax(len2, axis=0)
    return jnp.take_along_axis(v, best[None, ..., None], axis=0)[0]


def _bilinear(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear fetch with clamp-to-edge; uv (H, W, 2) in [0,1]."""
    h, w = img.shape[:2]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def g(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        return img[yi, xi]

    c00 = g(y0, x0)
    c10 = g(y0, x0 + 1)
    c01 = g(y0 + 1, x0)
    c11 = g(y0 + 1, x0 + 1)
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def catmull_rom(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Jimenez optimized 5-tap Catmull-Rom (taa_resolve.comp:90-127)."""
    h, w = img.shape[:2]
    res = jnp.array([w, h], jnp.float32)
    inv_res = 1.0 / res
    position = uv * res
    center = jnp.floor(position - 0.5) + 0.5
    f = position - center
    f2 = f * f
    f3 = f * f2
    c = 0.7
    w0 = -c * f3 + 2.0 * c * f2 - c * f
    w1 = (2.0 - c) * f3 - (3.0 - c) * f2 + 1.0
    w2 = -(2.0 - c) * f3 + (3.0 - 2.0 * c) * f2 + c * f
    w3 = c * f3 - c * f2
    w12 = w1 + w2
    tc12 = inv_res * (center + w2 / w12)
    tc0 = inv_res * (center - 1.0)
    tc3 = inv_res * (center + 2.0)

    def s(u, v):
        return _bilinear(img, jnp.stack([u, v], axis=-1))

    center_color = s(tc12[..., 0], tc12[..., 1])
    acc = jnp.concatenate([center_color, jnp.ones_like(center_color[..., :1])], -1) * (
        w12[..., 0:1] * w12[..., 1:2]
    )

    def tap(u, v, weight):
        col = s(u, v)
        return jnp.concatenate([col, jnp.ones_like(col[..., :1])], -1) * weight[..., None]

    acc = acc + tap(tc12[..., 0], tc0[..., 1], w12[..., 0] * w0[..., 1])
    acc = acc + tap(tc0[..., 0], tc12[..., 1], w0[..., 0] * w12[..., 1])
    acc = acc + tap(tc3[..., 0], tc12[..., 1], w3[..., 0] * w12[..., 1])
    acc = acc + tap(tc12[..., 0], tc3[..., 1], w12[..., 0] * w3[..., 1])
    return acc[..., :3] / acc[..., 3:4]


@partial(
    jax.jit,
    static_argnames=(
        "ignore_history",
        "use_catmull_rom",
        "color_clipping",
        "velocity_sampling",
        "luminance_weighting",
    ),
)
def taa_resolve(
    illumination: jnp.ndarray,  # (H, W, 3)
    previous_resolved: jnp.ndarray,  # (H, W, 3)
    velocity: jnp.ndarray,  # (H, W, 2)
    depth: jnp.ndarray,  # (H, W) reverse-z
    ignore_history: bool = False,
    use_catmull_rom: bool = True,
    color_clipping: str = "variance",  # none|minmax|variance
    velocity_sampling: str = "closest",  # center|largest|closest
    luminance_weighting: bool = True,
) -> jnp.ndarray:
    if ignore_history:
        return illumination

    h, w = illumination.shape[:2]
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)

    if velocity_sampling == "center":
        vel = velocity
    elif velocity_sampling == "largest":
        vel = largest_velocity(velocity)
    else:
        vel = closest_velocity(velocity, depth)

    reproj = uv - vel * jnp.array([0.5, -0.5])
    on_screen = jnp.all(
        (reproj >= 0.0) & (reproj <= 1.0), axis=-1, keepdims=True
    )

    if use_catmull_rom:
        prev = catmull_rom(previous_resolved, reproj)
    else:
        prev = _bilinear(previous_resolved, reproj)

    if color_clipping == "minmax":
        prev = min_max_clip(illumination, prev)
    elif color_clipping == "variance":
        prev = variance_clip(illumination, prev)

    current_weight = jnp.full(illumination.shape[:2] + (1,), 0.1, jnp.float32)
    history_weight = 1.0 - current_weight
    if luminance_weighting:
        current_weight = current_weight * (
            1.0 / (1.0 + luminance(illumination))[..., None]
        )
        history_weight = history_weight * (
            1.0 / (1.0 + luminance(prev))[..., None]
        )
    resolved = (illumination * current_weight + prev * history_weight) / jnp.maximum(
        current_weight + history_weight, 1e-5
    )
    return jnp.where(on_screen, resolved, illumination)
