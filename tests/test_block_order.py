"""Block16 pixel-order pipeline (the deferred TPU fast path): the
G-buffer, tile transforms and shading kernel must produce exactly the
row-major path's values — only the memory order differs (and the
row-major permutes it exists to avoid)."""

from contextlib import contextmanager
from unittest import mock

import numpy as np
import jax.numpy as jnp
import jax.experimental.pallas as pl

from prosper_tpu.ops import trace
from prosper_tpu.testing import make_test_scene

W = H = 64


@contextmanager
def interpret_mode():
    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", interp):
        yield


def _scene():
    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    dev = lambda t: {  # noqa: E731
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in t.items()
    }
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    return dev(static), dev(frame), dev(arena), cam


def test_tile_transforms_roundtrip():
    from prosper_tpu.ops.shade_tiles import (
        from_tiles_to_blocks,
        to_tiles_from_blocks,
    )

    rng = np.random.default_rng(0)
    px, py, hp = trace.block_order_padded(W, H)
    a = jnp.asarray(rng.random((W * hp, 5), dtype=np.float32))
    tiles = to_tiles_from_blocks(a, W)
    assert tiles.shape == (W // 32 * (hp // 32), 5, 8, 128)
    back = from_tiles_to_blocks(tiles, W)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))

    # tile t must hold exactly the pixels of froxel tile t (the shade
    # kernel never reads within-tile pixel coordinates, so the
    # within-tile ORDER is the block layout, not to_tiles' row-major —
    # round 5; the order must still be the SAME for every channel)
    from prosper_tpu.ops.shade_tiles import to_tiles

    rows = trace.blocks_to_rows(a, W, H)
    tiles_row = np.asarray(to_tiles(rows, W, H))
    tiles_np = np.asarray(tiles)
    flat_new = tiles_np.reshape(tiles_np.shape[0], 5, 1024)
    flat_row = tiles_row.reshape(tiles_row.shape[0], 5, 1024)
    # same multiset of pixels per tile...
    np.testing.assert_array_equal(
        np.sort(flat_new, axis=-1), np.sort(flat_row, axis=-1)
    )
    # ...and one consistent within-tile permutation across channels
    perm = np.argsort(flat_new[:, 0], axis=-1)
    want = np.take_along_axis(flat_row[:, 0], np.argsort(flat_row[:, 0]), -1)
    for c in range(5):
        got = np.take_along_axis(flat_new[:, c], perm, -1)
        ref = np.take_along_axis(
            flat_row[:, c], np.argsort(flat_row[:, 0], axis=-1), -1
        )
        np.testing.assert_array_equal(got, ref)


def test_gbuffer_block16_matches_row():
    from prosper_tpu.render.gbuffer import render_gbuffer

    static, frame, arena, cam = _scene()
    g_row = render_gbuffer(static, frame, arena, cam, W, H)
    g_blk = render_gbuffer(
        static, frame, arena, cam, W, H, pixel_order="block16"
    )
    for k in ("albedo_roughness", "normal_metallic", "depth", "z_cam",
              "velocity", "position_ws", "valid"):
        got = np.asarray(trace.blocks_to_rows(g_blk[k], W, H))
        want = np.asarray(g_row[k])
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6, err_msg=k)


def test_shade_tiles_block16_matches_row():
    from prosper_tpu.ops.shade_tiles import shade_clustered_tiles
    from prosper_tpu.render.gbuffer import render_gbuffer
    from prosper_tpu.render.shading import pack_light_table

    static, frame, arena, cam = _scene()
    lights = {k: np.array(v) for k, v in frame["lights"].items()}
    rng = np.random.default_rng(1)
    n = 40
    lights["point_position"][:n] = rng.uniform(-4, 4, (n, 3))
    lights["point_radiance"][:n] = rng.uniform(0.2, 2.0, (n, 3))
    lights["point_radius"][:n] = 6.0
    lights["point_count"] = np.int32(n)
    lights = {k: jnp.asarray(v) for k, v in lights.items()}
    lights["packed_rows"] = pack_light_table(lights)

    g_row = render_gbuffer(static, frame, arena, cam, W, H)
    g_blk = render_gbuffer(
        static, frame, arena, cam, W, H, pixel_order="block16"
    )

    def surf(g):
        s = g["surface"]
        return {
            "position_ws": s["position_ws"],
            "normal_ws": s["normal_ws"],
            "inv_view_ray": s["inv_view_ray"],
            "albedo": s["albedo"],
            "roughness": s["roughness"],
            "metallic": s["metallic"],
            "NoV": s["NoV"],
        }

    with interpret_mode():
        c_row = shade_clustered_tiles(
            surf(g_row), lights, cam, g_row["z_cam"], g_row["valid"], W, H
        )
        c_blk = shade_clustered_tiles(
            surf(g_blk), lights, cam, g_blk["z_cam"], g_blk["valid"], W, H,
            pixel_order="block16",
        )
    got = np.asarray(trace.blocks_to_rows(c_blk, W, H))
    np.testing.assert_allclose(
        got, np.asarray(c_row), rtol=1e-5, atol=1e-5
    )
    assert np.abs(np.asarray(c_row)).sum() > 0


def test_restir_stages_order_invariant():
    """ReSTIR per-pixel stages keyed by absolute (px, py) must give the
    same per-pixel result in block16 order as in row-major order (the
    TPU render_restir path relies on this)."""
    from prosper_tpu.render.gbuffer import render_gbuffer
    from prosper_tpu.render.restir import (
        initial_reservoirs,
        pack_neighbor_rows,
        spatial_reuse,
    )

    static, frame, arena, cam = _scene()
    lights = frame["lights"]

    g_row = render_gbuffer(static, frame, arena, cam, W, H)
    g_blk = render_gbuffer(
        static, frame, arena, cam, W, H, pixel_order="block16"
    )

    def lin(g):
        c2c = cam["camera_to_clip"]
        return -c2c[2, 3] / (g["depth"] + c2c[2, 2])

    def surf(g):
        s = dict(g["surface"])
        s["linear_depth"] = lin(g)
        return s

    px_r = jnp.tile(jnp.arange(W, dtype=jnp.uint32), H)
    py_r = jnp.repeat(jnp.arange(H, dtype=jnp.uint32), W)
    px_b, py_b, _hp = trace.block_order_padded(W, H)
    px_b, py_b = jnp.asarray(px_b), jnp.asarray(py_b)

    li_r, ucw_r = initial_reservoirs(surf(g_row), lights, px_r, py_r, 7)
    li_b, ucw_b = initial_reservoirs(surf(g_blk), lights, px_b, py_b, 7)
    li_r = jnp.where(g_row["valid"], li_r, -1)
    li_b = jnp.where(g_blk["valid"], li_b, -1)
    np.testing.assert_array_equal(
        np.asarray(trace.blocks_to_rows(li_b, W, H)), np.asarray(li_r)
    )

    g2r = dict(g_row); g2r["linear_depth"] = lin(g_row)
    g2b = dict(g_blk); g2b["linear_depth"] = lin(g_blk)
    rows_r = pack_neighbor_rows(g2r, li_r, ucw_r)
    rows_b = trace.blocks_to_rows(
        pack_neighbor_rows(g2b, li_b, ucw_b), W, H
    )
    np.testing.assert_allclose(
        np.asarray(rows_b), np.asarray(rows_r), rtol=1e-6, atol=1e-6
    )

    li2_r, ucw2_r = spatial_reuse(
        surf(g_row), lights, rows_r, px_r, py_r, W, H, 7
    )
    li2_b, ucw2_b = spatial_reuse(
        surf(g_blk), lights, rows_b, px_b, py_b, W, H, 7
    )
    np.testing.assert_array_equal(
        np.asarray(trace.blocks_to_rows(li2_b, W, H)), np.asarray(li2_r)
    )
    np.testing.assert_allclose(
        np.asarray(trace.blocks_to_rows(ucw2_b, W, H)),
        np.asarray(ucw2_r),
        rtol=1e-5,
        atol=1e-6,
    )
