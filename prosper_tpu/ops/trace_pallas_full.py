"""Extended Pallas closest-hit kernel: intersection + attribute
interpolation fused.

The plain kernel (ops/trace_pallas.py) returns (t, tri, u, v) and XLA
then gathers vertex attributes, instance transforms and material ids per
ray — ~8 scattered gathers per bounce that dominate the frame on TPU
(XLA row-gather throughput ~100M rows/s). Here each cluster slab carries
its triangles' *world-space* attributes, so the winning lane's
interpolated normal/tangent/uv/material fall out of VMEM registers with
zero post-pass gathers.

Slab layout (C, 40, 128) f32:
  0-8    v0 | e1 | e2 (xyz each)         - Möller inputs, world space
  9-17   n0 | n1 | n2 (xyz each)         - world-space vertex normals
  18-29  t0 | t1 | t2 (xyzw each)        - world-space tangents + sign
  30-35  uv0 | uv1 | uv2 (uv each)
  36     material id (bitcast-exact in f32 for ids < 2^24)
  37-39  pad

Attributes are re-transformed to world space on device per frame in the
same batched op as the TLAS flattening (pack_tris_full), keeping
animation parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import CLUSTER_PAD, TILE, _pad_rays
from .trace_pallas import _moller_block

ROWS = 40
TRIS_DTYPE = jnp.float32  # device geometry dtype for the trace slabs.
# f16 (Mesh.hpp:11-15 parity: f16x4 positions / f16x2 UVs) halves
# geometry HBM + leaf-slab DMA bytes and works in interpret mode, but
# the TPU Mosaic dialect REJECTS f16 outright ("Unsupported type in
# mosaic dialect: 'f16'", measured on v5e in round 4) — so the on-chip
# default stays f32. bf16 is Mosaic-supported but its 8-bit mantissa
# (~0.4% relative step) is too coarse for hit-t agreement on unit-scale
# scenes. If leaf-slab DMA ever dominates an xprof trace, the supported
# route is i16-bitcast f16 rows with an in-kernel integer decode.


def pack_tris_full(static_scene: dict, frame: dict, dtype=None) -> jnp.ndarray:
    """Per-frame (C, 40, 128) slabs: world-space geometry + attributes.

    dtype=float16 halves the traversal loop's HBM traffic — the
    reference quantizes its vertex buffers the same way (f16x4 positions,
    f16x2 UVs, src/scene/Mesh.hpp:11-15); the BVH kernels convert rows
    back to f32 in VMEM registers. dtype=None uses the module default
    TRIS_DTYPE."""
    if dtype is None:
        dtype = TRIS_DTYPE
    inst = static_scene["wt_instance"]  # (S,)
    m = frame["transforms"][inst]  # (S, 3, 4)
    nm = frame["normal_transforms"][inst]  # (S, 3, 3)

    def xf_point(p):
        return jnp.einsum("sij,sj->si", m[:, :, :3], p) + m[:, :, 3]

    def xf_dir(v):
        return jnp.einsum("sij,sj->si", m[:, :, :3], v)

    def xf_normal(n):
        out = jnp.einsum("sij,sj->si", nm, n)
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-20
        )

    p0 = xf_point(static_scene["wt_p0"])
    p1 = xf_point(static_scene["wt_p1"])
    p2 = xf_point(static_scene["wt_p2"])

    ap = static_scene["a_packed"]  # (V, 12): n3 | t4 | uv2 | pad
    aidx = static_scene["wt_aidx"]  # (S, 3)
    a0, a1, a2 = ap[aidx[:, 0]], ap[aidx[:, 1]], ap[aidx[:, 2]]

    n0 = xf_normal(a0[:, 0:3])
    n1 = xf_normal(a1[:, 0:3])
    n2 = xf_normal(a2[:, 0:3])

    def xf_tan(a):
        t = xf_dir(a[:, 3:6])
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
        return jnp.concatenate([t, a[:, 6:7]], axis=1)

    t0 = xf_tan(a0)
    t1 = xf_tan(a1)
    t2 = xf_tan(a2)

    mat = static_scene["wt_material"].astype(jnp.float32)[:, None]

    # per-triangle ray-cone LOD constant: 0.5*log2(uv_area/world_area)
    # (uv-texel density; world-space so instance scaling is included)
    e1w, e2w = p1 - p0, p2 - p0
    w_area = jnp.linalg.norm(jnp.cross(e1w, e2w), axis=-1)
    uve1 = a1[:, 7:9] - a0[:, 7:9]
    uve2 = a2[:, 7:9] - a0[:, 7:9]
    uv_area = jnp.abs(uve1[:, 0] * uve2[:, 1] - uve1[:, 1] * uve2[:, 0])
    tri_lod = 0.5 * jnp.log2(
        jnp.maximum(uv_area, 1e-20) / jnp.maximum(w_area, 1e-20)
    )[:, None]

    rows = jnp.concatenate(
        [
            p0, e1w, e2w,                    # 0-8
            n0, n1, n2,                      # 9-17
            t0, t1, t2,                      # 18-29
            a0[:, 7:9], a1[:, 7:9], a2[:, 7:9],  # 30-35
            mat,                             # 36
            tri_lod,                         # 37
            jnp.zeros((mat.shape[0], 2), jnp.float32),  # 38-39
        ],
        axis=1,
    )  # (S, 40)
    C = rows.shape[0] // CLUSTER_PAD
    return rows.reshape(C, CLUSTER_PAD, ROWS).transpose(0, 2, 1).astype(dtype)


def _kernel(
    counts_ref,  # scalar-prefetch SMEM (T,)
    lists_ref,  # VMEM (1, 1, MAXC)
    enters_ref,  # VMEM (1, 1, MAXC) f32 front-to-back entry distances
    o_ref,  # VMEM (1, TILE, 3)
    d_ref,  # VMEM (1, TILE, 3)
    tmax_ref,  # VMEM (1, TILE, 1)
    tris_hbm,  # ANY (C, 40, 128)
    t_out,  # VMEM (1, TILE, 1)
    tri_out,  # (1, TILE, 1) i32
    attr_out,  # (1, TILE, 12): n3 | t4 | uv2 | mat | pad2
    tri_slab,  # VMEM scratch (2, 40, 128)
    list_smem,  # SMEM scratch (1, MAXC)
    enter_smem,  # SMEM scratch (1, MAXC) f32
    attr_scr,  # VMEM scratch (TILE, 12) - best attributes
    sems,
):
    count = counts_ref[pl.program_id(0)]
    lcopy = pltpu.make_async_copy(lists_ref.at[0], list_smem, sems.at[2])
    lcopy.start()
    ecopy = pltpu.make_async_copy(enters_ref.at[0], enter_smem, sems.at[3])
    ecopy.start()

    ox = o_ref[0, :, 0:1]
    oy = o_ref[0, :, 1:2]
    oz = o_ref[0, :, 2:3]
    dx = d_ref[0, :, 0:1]
    dy = d_ref[0, :, 1:2]
    dz = d_ref[0, :, 2:3]
    t_min = 1e-4

    lcopy.wait()
    ecopy.wait()

    def get_dma(slot, k):
        c = list_smem[0, k]
        return pltpu.make_async_copy(
            tris_hbm.at[c], tri_slab.at[slot], sems.at[slot]
        )

    @pl.when(count > 0)
    def _():
        get_dma(0, 0).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
    attr_scr[...] = jnp.zeros((TILE, 12), jnp.float32)

    def cond(state):
        # front-to-back early exit (see trace_pallas._closest_kernel)
        k, _, _, worst = state
        return (k < count) & (enter_smem[0, k] < worst)

    def body(state):
        k, best_t, best_tri, worst = state
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < count)
        def _():
            get_dma(jax.lax.rem(k + 1, 2), k + 1).start()

        get_dma(slot, k).wait()
        slab = tri_slab[slot].astype(jnp.float32)

        hit, t, u, v = _moller_block(
            slab[0:9], ox, oy, oz, dx, dy, dz, t_min, best_t
        )
        tmin = jnp.min(t, axis=1, keepdims=True)
        improved = tmin < best_t
        is_best = t == tmin
        j = jnp.min(jnp.where(is_best, lane, 128), axis=1, keepdims=True)

        # Attribute interpolation runs only when some ray improved this
        # iteration (a scalar branch): after the first few clusters most
        # visits improve nothing, so the ~50-op interpolation block is
        # skipped and the loop costs the same as the plain kernel.
        @pl.when(jnp.any(improved))
        def _():
            sel = is_best & (lane == j)
            selw = sel.astype(jnp.float32)
            w_b = 1.0 - u - v

            def interp(r0, r1, r2):
                a = (
                    w_b * slab[r0 : r0 + 1, :]
                    + u * slab[r1 : r1 + 1, :]
                    + v * slab[r2 : r2 + 1, :]
                )
                return jnp.sum(a * selw, axis=1, keepdims=True)  # (TILE, 1)

            attrs = [
                interp(9 + c, 12 + c, 15 + c) for c in range(3)  # normal
            ] + [
                interp(18 + c, 22 + c, 26 + c) for c in range(4)  # tangent
            ] + [
                interp(30 + c, 32 + c, 34 + c) for c in range(2)  # uv
            ]
            mat_row = jnp.sum(slab[36:37, :] * selw, axis=1, keepdims=True)
            lod_row = jnp.sum(slab[37:38, :] * selw, axis=1, keepdims=True)
            new_attr = jnp.concatenate(
                attrs + [mat_row, lod_row, jnp.zeros((TILE, 1), jnp.float32)],
                axis=1,
            )  # (TILE, 12)
            attr_scr[...] = jnp.where(improved, new_attr, attr_scr[...])

        c = list_smem[0, k]
        best_tri = jnp.where(improved, c * CLUSTER_PAD + j, best_tri)
        best_t = jnp.where(improved, tmin, best_t)
        worst = jnp.max(best_t)
        return (k + 1, best_t, best_tri, worst)

    init = (
        jnp.int32(0),
        tmax_ref[0],
        jnp.full((TILE, 1), -1, jnp.int32),
        jnp.max(tmax_ref[0]),
    )
    k_final, best_t, best_tri, _ = jax.lax.while_loop(cond, body, init)

    # drain: an early exit leaves the prefetched DMA for k_final in
    # flight; an unconsumed DMA semaphore aborts the program
    @pl.when((k_final > 0) & (k_final < count))
    def _():
        get_dma(jax.lax.rem(k_final, 2), k_final).wait()

    t_out[0] = best_t
    tri_out[0] = best_tri
    attr_out[0] = attr_scr[...]


@partial(jax.jit, static_argnames=("max_clusters",))
def trace_closest_full(
    tris_packed: jnp.ndarray,  # (C, 40, 128)
    wc_min: jnp.ndarray,
    wc_max: jnp.ndarray,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_min,
    t_max,
    max_clusters: int | None = None,
):
    """Closest hit + interpolated world-space surface attributes.

    Returns dict: t, tri, normal (R,3), tangent (R,4), uv (R,2),
    material (R,) i32.
    """
    del t_min
    from .trace_pallas import _prep

    maxc, R, R_out, n_tiles, o_t, d_t, t_max_t, lists, counts, enters = _prep(
        ray_o, ray_d, t_max, wc_min, wc_max, max_clusters
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, maxc), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, maxc), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TILE, 3), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TILE, 3), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TILE, 1), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE, 1), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 1), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, 12), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, 128), tris_packed.dtype),
            pltpu.SMEM((1, maxc), jnp.int32),
            pltpu.SMEM((1, maxc), jnp.float32),
            pltpu.VMEM((TILE, 12), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    t, tri, attr = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, TILE, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, TILE, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, TILE, 12), jnp.float32),
        ],
    )(
        counts,
        lists[:, None, :],
        enters[:, None, :],
        o_t,
        d_t,
        t_max_t[:, :, None],
        tris_packed,
    )

    attr = attr.reshape(R, 12)[:R_out]
    return {
        "t": t.reshape(R)[:R_out],
        "tri": tri.reshape(R)[:R_out],
        "normal": attr[:, 0:3],
        "tangent": attr[:, 3:7],
        "uv": attr[:, 7:9],
        "material": attr[:, 9].astype(jnp.int32),
        "tri_lod": attr[:, 10],
    }
