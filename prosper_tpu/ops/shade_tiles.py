"""Tile-major clustered deferred shading (Pallas TPU kernel).

The round-1 XLA path (ops/clustering.py eval_clustered_lights) gathered a
128-entry froxel list PER PIXEL (2M x 128 gather rows at 1080p) and
looped every pixel to the global max froxel count. This kernel instead
walks one 32x32-pixel tile per grid step — the froxel x/y cell of
light_clustering.comp — so the light list is fetched ONCE per tile (the
reference's shared-memory list, light_clustering.comp:15-21) and light
parameters are read from SMEM scalars broadcast over the tile's 1024
pixels laid out as (8, 128) vregs.

Froxel parity: the host builds per-tile lists from the same side-plane
tests as light_clustering.comp (ascending light index); the kernel
applies each pixel's z-slice slab test analytically (Doom slice bounds
recomputed from the pixel's view z, light_clusters.glsl:26-50) and
enforces the 128-per-froxel cap with a per-pixel running count, so the
shaded light set per pixel is exactly the reference's froxel list.
Spot lights are all-visible per the reference quirk (isSpotVisible
returns true) with the same 128 cap.

Light rows use the packed (1+P+S, 12) table (render/shading.py
pack_light_table); BRDF math ports brdf.glsl:9-88 componentwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clustering import LIGHT_CLUSTER_DIMENSION, Z_SLICE_COUNT

TILE_PX = LIGHT_CLUSTER_DIMENSION  # 32
_PXROWS = (TILE_PX * TILE_PX) // 128  # 8 rows of 128 lanes per tile
_PI = float(np.pi)
CHANNELS = 16  # pos3 | normal3 | albedo3 | rough | metal | z_cam | valid | pad3
MAX_FROXEL_LIGHTS = 128


def _cdiv(a, b):
    return -(-a // b)


def tile_grid(width: int, height: int) -> tuple[int, int]:
    return _cdiv(width, TILE_PX), _cdiv(height, TILE_PX)


def to_tiles(flat: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """(R, C) row-major pixels -> (T, C, 8, 128) tile-major blocks."""
    tx, ty = tile_grid(width, height)
    C = flat.shape[-1]
    img = flat.reshape(height, width, C)
    img = jnp.pad(
        img,
        ((0, ty * TILE_PX - height), (0, tx * TILE_PX - width), (0, 0)),
    )
    img = img.reshape(ty, TILE_PX, tx, TILE_PX, C)
    img = img.transpose(0, 2, 4, 1, 3)  # (ty, tx, C, 32, 32)
    return img.reshape(ty * tx, C, _PXROWS, 128)


def from_tiles(tiles: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """(T, C, 8, 128) -> (R, C) row-major pixels (crop padding)."""
    tx, ty = tile_grid(width, height)
    C = tiles.shape[1]
    img = tiles.reshape(ty, tx, C, TILE_PX, TILE_PX)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        ty * TILE_PX, tx * TILE_PX, C
    )
    return img[:height, :width].reshape(height * width, C)


def to_tiles_from_blocks(flat: jnp.ndarray, width: int) -> jnp.ndarray:
    """(R_pad, C) in block16 order (trace.block_order_padded) ->
    (T, C, 8, 128) froxel tiles. The block order is TILE-MAJOR (round
    5): a 32 px froxel tile is 1024 CONSECUTIVE rows, so this is one
    minor-axes transpose — the shade kernel never reads within-tile
    pixel coordinates, so the within-tile order is free to stay in
    block layout. Requires width % 32 == 0."""
    C = flat.shape[-1]
    T = flat.shape[0] // 1024
    a = flat.reshape(T, 1024, C)
    return jnp.transpose(a, (0, 2, 1)).reshape(T, C, _PXROWS, 128)


def stack_tiles_from_blocks(channels, width: int) -> jnp.ndarray:
    """Per-channel (R_pad,) block16-order arrays -> (T, C, 8, 128)
    froxel tiles WITHOUT the channel-minor transpose: each channel
    reshapes to its tile rows for free (tile-major order) and one stack
    interleaves them — replaces concat(R,16) + to_tiles_from_blocks."""
    T = channels[0].shape[0] // 1024
    return jnp.stack(
        [c.reshape(T, _PXROWS, 128) for c in channels], axis=1
    )


def from_tiles_to_blocks(tiles: jnp.ndarray, width: int) -> jnp.ndarray:
    """(T, C, 8, 128) froxel tiles -> (R_pad, C) block16 order (inverse
    of to_tiles_from_blocks)."""
    T, C = tiles.shape[0], tiles.shape[1]
    a = tiles.reshape(T, C, 1024)
    return jnp.transpose(a, (0, 2, 1)).reshape(T * 1024, C)


def build_tile_light_lists(cam: dict, lights: dict, width: int, height: int,
                           y_offset=0, full_height: int | None = None):
    """Per-tile point light lists from the froxel side-plane tests
    (light_clustering.comp:67-99; same math as
    clustering.build_light_clusters, z handled per pixel in-kernel).

    Returns (lists (T, LCAP) i32, counts (T,) i32, light_vz (1, LCAP) f32)
    with T in (ty, tx) row-major order matching to_tiles."""
    full_h = height if full_height is None else full_height
    fx, fy = tile_grid(width, height)
    c2c = cam["camera_to_clip"]
    w2c = cam["world_to_camera"]

    tile_scale = (
        jnp.array([width, full_h], jnp.float32) / (2.0 * TILE_PX)
    )
    cx = jnp.arange(fx, dtype=jnp.float32)
    # absolute froxel row (band sharding: y_offset must be a multiple of
    # the 32 px froxel tile)
    cy = jnp.arange(fy, dtype=jnp.float32) + y_offset / TILE_PX
    bias_x = tile_scale[0] - cx
    bias_y = tile_scale[1] - cy
    m00 = c2c[0, 0] * tile_scale[0]
    m11 = c2c[1, 1] * tile_scale[1]

    def norm_plane(p):
        return p / jnp.linalg.norm(p[..., :3], axis=-1, keepdims=True)

    zeros_x = jnp.zeros_like(bias_x)
    c1 = jnp.stack([jnp.full_like(bias_x, m00), zeros_x, -bias_x, zeros_x], -1)
    zeros_y = jnp.zeros_like(bias_y)
    c2 = jnp.stack([zeros_y, jnp.full_like(bias_y, m11), -bias_y, zeros_y], -1)
    c4 = jnp.array([0.0, 0.0, -1.0, 0.0])
    plane_xm = norm_plane(c4[None] - c1)
    plane_xp = norm_plane(c4[None] + c1)
    plane_ym = norm_plane(c4[None] - c2)
    plane_yp = norm_plane(c4[None] + c2)

    pos_vs = lights["point_position"] @ w2c[:3, :3].T + w2c[:3, 3]
    r = lights["point_radius"]
    n_l = pos_vs.shape[0]
    sxm = pos_vs @ plane_xm[:, :3].T - plane_xm[None, :, 3]
    sxp = pos_vs @ plane_xp[:, :3].T - plane_xp[None, :, 3]
    sym = pos_vs @ plane_ym[:, :3].T - plane_ym[None, :, 3]
    syp = pos_vs @ plane_yp[:, :3].T - plane_yp[None, :, 3]
    vx = (sxm >= -r[:, None]) & (sxp >= -r[:, None])  # (L, FX)
    vy = (sym >= -r[:, None]) & (syp >= -r[:, None])  # (L, FY)
    in_range = jnp.arange(n_l) < lights["point_count"]

    vis = (
        vy.T[:, None, :, ]  # (FY, 1, L)
        & vx.T[None, :, :]  # (1, FX, L)
        & in_range[None, None, :]
    ).reshape(fy * fx, n_l)
    counts = vis.sum(axis=-1).astype(jnp.int32)
    order = jnp.argsort(~vis, axis=-1, stable=True)  # ascending index
    lcap = _cdiv(n_l, 128) * 128
    lists = order.astype(jnp.int32)
    if lists.shape[1] < lcap:
        lists = jnp.pad(lists, ((0, 0), (0, lcap - lists.shape[1])))
    else:
        lists = lists[:, :lcap]
    vz = jnp.zeros((1, lcap), jnp.float32).at[0, :n_l].set(pos_vs[:, 2])
    return lists, counts, vz


def _shade_kernel(
    counts_ref,  # prefetch (T,) i32
    ints_ref,  # prefetch (1, 4) i32: point_count, spot_eff, 0, 0
    scalars_ref,  # prefetch (1, 8) f32: near, far, log(far/near), eye.xyz
    lrows_ref,  # prefetch (1, L*12) f32 packed light rows
    lvz_ref,  # prefetch (1, LCAP) f32 light view-space z
    lists_hbm,  # ANY (T, 1, LCAP) i32
    chan_ref,  # VMEM (1, 16, 8, 128)
    out_ref,  # VMEM (1, 4, 8, 128)
    list_smem,  # SMEM (1, LCAP) i32
    sems,  # DMA (1,)
):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(lists_hbm.at[t], list_smem, sems.at[0])
    cp.start()

    px = chan_ref[0, 0]
    py = chan_ref[0, 1]
    pz = chan_ref[0, 2]
    nx = chan_ref[0, 3]
    ny = chan_ref[0, 4]
    nz = chan_ref[0, 5]
    ar = chan_ref[0, 6]
    ag = chan_ref[0, 7]
    ab = chan_ref[0, 8]
    rough = chan_ref[0, 9]
    metal = chan_ref[0, 10]
    z_cam = chan_ref[0, 11]
    valid = chan_ref[0, 12] > 0.0

    near = scalars_ref[0, 0]
    lr = scalars_ref[0, 2]  # log(far / near)

    # per-pixel Doom z-slice bounds (light_clusters.glsl:26-50); slice 0's
    # near plane sits at 0 like the cluster builder
    ratio = jnp.log(jnp.maximum(-z_cam / near, 1e-20)) / lr
    si = jnp.clip(
        (Z_SLICE_COUNT * ratio).astype(jnp.int32), 0, Z_SLICE_COUNT - 1
    ).astype(jnp.float32)
    near_d = jnp.where(si == 0.0, 0.0, near * jnp.exp(si / Z_SLICE_COUNT * lr))
    far_d = near * jnp.exp((si + 1.0) / Z_SLICE_COUNT * lr)

    # view ray + NoV (deferred_shading.comp surface reconstruction)
    ivx = scalars_ref[0, 3] - px
    ivy = scalars_ref[0, 4] - py
    ivz = scalars_ref[0, 5] - pz
    inv_len = jax.lax.rsqrt(
        jnp.maximum(ivx * ivx + ivy * ivy + ivz * ivz, 1e-40)
    )
    ivx = ivx * inv_len
    ivy = ivy * inv_len
    ivz = ivz * inv_len
    NoV = jnp.clip(nx * ivx + ny * ivy + nz * ivz, 0.0, 1.0)

    # brdf.glsl:64-88 precomputable terms
    f0r = 0.04 * (1.0 - metal) + ar * metal
    f0g = 0.04 * (1.0 - metal) + ag * metal
    f0b = 0.04 * (1.0 - metal) + ab * metal
    cdr = ar * 0.96 * (1.0 - metal)
    cdg = ag * 0.96 * (1.0 - metal)
    cdb = ab * 0.96 * (1.0 - metal)
    alpha = rough * rough
    k = jnp.maximum(alpha * 0.5, 1e-4)
    a2 = alpha * alpha
    gv = NoV / (NoV * (1.0 - k) + k)

    def light_contrib(lx_to, ly_to, lz_to):
        """Unit light dir -> per-channel brdf * NoL (brdf.glsl:70-88);
        caller multiplies by radiance and falloff."""
        # half vector
        hx = lx_to + ivx
        hy = ly_to + ivy
        hz = lz_to + ivz
        hil = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-40))
        hx = hx * hil
        hy = hy * hil
        hz = hz * hil
        NoL = jnp.clip(nx * lx_to + ny * ly_to + nz * lz_to, 0.0, 1.0)
        NoH = jnp.clip(nx * hx + ny * hy + nz * hz, 0.0, 1.0)
        VoH = jnp.clip(ivx * hx + ivy * hy + ivz * hz, 0.0, 1.0)
        denom_d = NoH * NoH * (a2 - 1.0) + 1.0
        D = a2 / (_PI * denom_d * denom_d)
        gl = NoL / (NoL * (1.0 - k) + k)
        G = gl * gv
        fr = jnp.power(1.0 - VoH, 5.0)
        spec = D * G / (4.0 * NoL * NoV + 1e-4)
        br = cdr / _PI + spec * (f0r + (1.0 - f0r) * fr)
        bg = cdg / _PI + spec * (f0g + (1.0 - f0g) * fr)
        bb = cdb / _PI + spec * (f0b + (1.0 - f0b) * fr)
        return br * NoL, bg * NoL, bb * NoL

    pc = ints_ref[0, 0]
    # sky/background tiles skip the whole light walk (their pixels are
    # zeroed by the valid mask regardless) — on sparse scenes most 32px
    # froxel tiles contain no geometry
    any_valid = jnp.any(valid)
    spot_eff = jnp.where(any_valid, ints_ref[0, 1], 0)
    tile_count = jnp.where(any_valid, counts_ref[t], 0)
    zero = jnp.zeros((_PXROWS, 128), jnp.float32)

    cp.wait()

    def point_body(j, carry):
        accr, accg, accb, cnt = carry
        li = list_smem[0, j]
        row = 12 * (1 + li)
        zl = lvz_ref[0, li]
        rl = lrows_ref[0, row + 7]
        # z-slab test vs the pixel's slice (build_light_clusters parity)
        vis = ((-zl - near_d) >= -rl) & ((zl + far_d) >= -rl)
        shaded = vis & (cnt < MAX_FROXEL_LIGHTS)
        # point irradiance (sample_light_packed parity)
        tx = lrows_ref[0, row + 4] - px
        ty = lrows_ref[0, row + 5] - py
        tz = lrows_ref[0, row + 6] - pz
        d2 = tx * tx + ty * ty + tz * tz
        inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
        lx = tx * inv_d
        ly = ty * inv_d
        lz = tz * inv_d
        dpr = jnp.maximum(d2, 1e-20) * inv_d / jnp.maximum(rl, 1e-20)
        dpr2 = dpr * dpr
        radial = jnp.clip(1.0 - dpr2 * dpr2, 0.0, 1.0)
        fall = radial / jnp.maximum(d2, 1e-20)
        br, bg, bb = light_contrib(lx, ly, lz)
        w = jnp.where(shaded, fall, 0.0)
        accr = accr + lrows_ref[0, row + 1] * w * br
        accg = accg + lrows_ref[0, row + 2] * w * bg
        accb = accb + lrows_ref[0, row + 3] * w * bb
        cnt = cnt + vis.astype(jnp.float32)
        return accr, accg, accb, cnt

    accr, accg, accb, _ = jax.lax.fori_loop(
        0, tile_count, point_body, (zero, zero, zero, zero)
    )

    def spot_body(j, carry):
        accr, accg, accb = carry
        row = 12 * (1 + pc + j)
        tx = lrows_ref[0, row + 4] - px
        ty = lrows_ref[0, row + 5] - py
        tz = lrows_ref[0, row + 6] - pz
        d2 = tx * tx + ty * ty + tz * tz
        inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-20))
        lx = tx * inv_d
        ly = ty * inv_d
        lz = tz * inv_d
        cd = -(
            lrows_ref[0, row + 8] * lx
            + lrows_ref[0, row + 9] * ly
            + lrows_ref[0, row + 10] * lz
        )
        ang = jnp.clip(
            cd * lrows_ref[0, row + 7] + lrows_ref[0, row + 11], 0.0, 1.0
        )
        fall = ang * ang / jnp.maximum(d2, 1e-20)
        br, bg, bb = light_contrib(lx, ly, lz)
        accr = accr + lrows_ref[0, row + 1] * fall * br
        accg = accg + lrows_ref[0, row + 2] * fall * bg
        accb = accb + lrows_ref[0, row + 3] * fall * bb
        return accr, accg, accb

    accr, accg, accb = jax.lax.fori_loop(
        0, spot_eff, spot_body, (accr, accg, accb)
    )

    out_ref[0, 0] = jnp.where(valid, accr, 0.0)
    out_ref[0, 1] = jnp.where(valid, accg, 0.0)
    out_ref[0, 2] = jnp.where(valid, accb, 0.0)
    out_ref[0, 3] = zero


@partial(
    jax.jit,
    static_argnames=("width", "height", "full_height", "pixel_order"),
)
def shade_clustered_tiles(
    surface: dict,
    lights: dict,
    cam: dict,
    z_cam: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
    y_offset=0,
    full_height: int | None = None,
    pixel_order: str = "row",
) -> jnp.ndarray:
    """Clustered point+spot shading -> (R, 3) linear color (TPU path).

    Replaces clustering.build_light_clusters + eval_clustered_lights for
    the deferred frame; same observable light set per pixel.
    y_offset/full_height: shade a band of a taller frame (y_offset must
    be a multiple of the 32 px froxel tile).
    pixel_order="block16": inputs (and the returned color) are in
    trace.block_order_padded order with R = width * padded_height —
    tile assembly is then a regular transpose instead of the row-major
    gather round-trip.
    """
    lists, counts, lvz = build_tile_light_lists(
        cam, lights, width, height, y_offset=y_offset, full_height=full_height
    )
    rows = lights["packed_rows"]
    blocked = pixel_order == "block16"
    if blocked:
        assert width % 32 == 0
        # y_offset is a traced arg under this function's own jit, so it
        # can only be validated when the caller hands in a concrete
        # value (the production block16 callers all pass literal 0).
        if isinstance(y_offset, (int, float)):
            assert y_offset == 0, "block16 shading requires y_offset == 0"
        # per-channel tile stacking: in the tile-major block order each
        # channel reshapes straight into its tile rows — no (R, 16)
        # concat, no channel-minor transpose (round 5)
        zero = jnp.zeros_like(z_cam)
        chan = stack_tiles_from_blocks(
            [
                surface["position_ws"][..., 0],
                surface["position_ws"][..., 1],
                surface["position_ws"][..., 2],
                surface["normal_ws"][..., 0],
                surface["normal_ws"][..., 1],
                surface["normal_ws"][..., 2],
                surface["albedo"][..., 0],
                surface["albedo"][..., 1],
                surface["albedo"][..., 2],
                surface["roughness"],
                surface["metallic"],
                z_cam,
                valid.astype(jnp.float32),
                zero,
                zero,
                zero,
            ],
            width,
        )
    else:
        packed = jnp.concatenate(
            [
                surface["position_ws"],
                surface["normal_ws"],
                surface["albedo"],
                surface["roughness"][..., None],
                surface["metallic"][..., None],
                z_cam[..., None],
                valid.astype(jnp.float32)[..., None],
                jnp.zeros((z_cam.shape[0], 3), jnp.float32),
            ],
            axis=-1,
        )
        chan = to_tiles(packed, width, height)
    T = chan.shape[0]
    lcap = lists.shape[1]
    ints = jnp.array(
        [[0, 0, 0, 0]], jnp.int32
    ).at[0, 0].set(lights["point_count"]).at[0, 1].set(
        jnp.minimum(lights["spot_count"], MAX_FROXEL_LIGHTS)
    )
    scalars = jnp.zeros((1, 8), jnp.float32)
    scalars = scalars.at[0, 0].set(cam["near"])
    scalars = scalars.at[0, 1].set(cam["far"])
    scalars = scalars.at[0, 2].set(jnp.log(cam["far"] / cam["near"]))
    scalars = scalars.at[0, 3:6].set(cam["eye"])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, CHANNELS, _PXROWS, 128),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 4, _PXROWS, 128),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        scratch_shapes=[
            pltpu.SMEM((1, lcap), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    (out,) = pl.pallas_call(
        _shade_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((T, 4, _PXROWS, 128), jnp.float32)],
    )(
        counts,
        ints,
        scalars,
        rows.reshape(1, -1),
        lvz,
        lists[:, None, :],
        chan,
    )
    if blocked:
        return from_tiles_to_blocks(out, width)[:, :3]
    return from_tiles(out, width, height)[:, :3]
