"""glTF sampler wrap modes in the quad-arena sampler (materials.glsl
sampler parity): REPEAT / CLAMP_TO_EDGE / MIRRORED_REPEAT, exercised
against a numpy reference implementing the GL wrap functions."""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.ops.texture import sample_bilinear
from prosper_tpu.scene.textures import pack_rgba8_quads


def _arena_1d(img, wrap_u, wrap_v, srgb=False):
    h, w = img.shape[:2]
    flags = (1 if srgb else 0) | (wrap_u << 1) | (wrap_v << 3)
    table = np.zeros((1, 13, 4), np.int32)
    table[0, :] = (0, w, h, flags)
    return {
        "data": jnp.asarray(pack_rgba8_quads(img).astype(np.uint32)),
        "table": jnp.asarray(table),
        "n_mips": jnp.ones(1, np.int32),
    }


def _ref_bilinear(img, u, v, wrap_u, wrap_v):
    """Numpy reference: GL wrap on the continuous texel coordinate."""
    h, w = img.shape[:2]
    f = img.astype(np.float64) / 255.0

    def wrap(c, n, mode):
        if mode == 0:  # REPEAT
            i0 = np.floor(c).astype(int)
            return i0 % n, (i0 + 1) % n, c - np.floor(c)
        if mode == 1:  # CLAMP
            c = np.clip(c, 0.0, n - 1.0)
        else:  # MIRROR
            m = np.mod(c + 0.5, 2.0 * n)
            c = np.clip(n - np.abs(m - n) - 0.5, 0.0, n - 1.0)
        i0 = np.floor(c).astype(int)
        i1 = np.minimum(i0 + 1, n - 1)
        return i0, i1, c - np.floor(c)

    x0, x1, fu = wrap(u * w - 0.5, w, wrap_u)
    y0, y1, fv = wrap(v * h - 0.5, h, wrap_v)
    fu = fu[:, None]
    fv = fv[:, None]
    return (
        f[y0, x0] * (1 - fu) * (1 - fv)
        + f[y0, x1] * fu * (1 - fv)
        + f[y1, x0] * (1 - fu) * fv
        + f[y1, x1] * fu * fv
    )


def test_wrap_modes_match_reference():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (8, 16, 4), dtype=np.uint8)
    # uv samples hanging well outside [0,1] to exercise every wrap branch
    uv = rng.uniform(-2.2, 3.2, (256, 2)).astype(np.float32)
    tex = jnp.zeros(256, jnp.int32)

    for wu in (0, 1, 2):
        for wv in (0, 1, 2):
            arena = _arena_1d(img, wu, wv)
            got = np.asarray(
                sample_bilinear(arena, tex, jnp.asarray(uv), 0)
            )
            want = _ref_bilinear(
                img, uv[:, 0].astype(np.float64),
                uv[:, 1].astype(np.float64), wu, wv,
            )
            np.testing.assert_allclose(
                got, want, atol=2e-3,
                err_msg=f"wrap_u={wu} wrap_v={wv}",
            )


def test_clamp_edge_ignores_baked_repeat_neighbor():
    """At u > 1 the CLAMP sample must equal the last column exactly —
    the quad arena's baked REPEAT +x neighbor (column 0) must get zero
    bilinear weight."""
    img = np.zeros((4, 4, 4), np.uint8)
    img[:, -1] = 200
    img[:, 0] = 50
    arena = _arena_1d(img, 1, 1)
    uv = jnp.asarray([[1.5, 0.5], [7.0, 0.5], [-3.0, 0.5]], jnp.float32)
    got = np.asarray(sample_bilinear(arena, jnp.zeros(3, jnp.int32), uv, 0))
    np.testing.assert_allclose(got[0], 200 / 255.0, atol=1e-3)
    np.testing.assert_allclose(got[1], 200 / 255.0, atol=1e-3)
    np.testing.assert_allclose(got[2], 50 / 255.0, atol=1e-3)
