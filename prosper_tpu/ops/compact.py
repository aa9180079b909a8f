"""Tile-granular wavefront compaction for sparse per-pixel work.

TPU-shaped alternative to the GPU's implicit early-out: element-level
scatters are slow on TPU (~20 ms at 2M rows) but TILE-level (256-lane)
gathers/scatters are near-free, and a prefix sum over R/256 tile flags
costs microseconds. `tile_apply` runs a per-lane function only on the
256-lane tiles where `mask` has any set lane, processing survivors in
fixed-capacity chunks with a dynamic lax.fori_loop trip count, and
scatters results back into zero-initialised full-size outputs.

Used by the path tracer's bounce wavefront (render/pt.py, inlined there
for its loop-carried state) and the G-buffer/deferred material passes
(render/gbuffer.py). The reference gets the same effect from rasterising
only covered fragments / early ray termination.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TILE = 256


def tile_apply(mask, fn, inputs, out_like=None, chunk_tiles: int = 512):
    """Apply `fn` to the 256-lane tiles of `inputs` selected by `mask`.

    mask: (R,) bool — lanes that need work; tiles with no set lane are
        skipped entirely.
    fn: (chunk_inputs: pytree of (C, ...) arrays, lane_mask: (C,) bool)
        -> pytree of (C, ...) arrays, C = chunk_tiles * 256.
    inputs: pytree of (R, ...) arrays (R must be a multiple of 256).
    out_like: pytree of ShapeDtypeStruct/arrays giving the per-lane
        output shapes ((R, ...)); derived with jax.eval_shape when None.
        Outputs are ZERO off-mask lanes — merge defaults with
        jnp.where(mask, ...) at the call site.

    Returns the (R, ...) output pytree.
    """
    leaves = jax.tree_util.tree_leaves(inputs)
    R = leaves[0].shape[0]
    assert R % TILE == 0, R
    n_tiles = R // TILE
    ct = min(chunk_tiles, n_tiles)

    tile_any = jnp.any(mask.reshape(n_tiles, TILE), axis=1)
    # Pad tidx to a ct multiple so the per-chunk dynamic_slice below never
    # clamps its start index (a clamped slice would overlap the previous
    # chunk and the .at[slc].add scatter would double-count those tiles).
    tidx_size = ((n_tiles + ct - 1) // ct) * ct
    tidx = jnp.nonzero(tile_any, size=tidx_size, fill_value=n_tiles)[
        0
    ].astype(jnp.int32)
    tcount = jnp.sum(tile_any.astype(jnp.int32))
    n_chunks = (tcount + ct - 1) // ct

    def tgather(a, slc):
        at = a.reshape((n_tiles, TILE) + a.shape[1:])
        return at[slc].reshape((ct * TILE,) + a.shape[1:])

    if out_like is None:
        chunk_in = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct((ct * TILE,) + a.shape[1:], a.dtype),
            inputs,
        )
        lane_in = jax.ShapeDtypeStruct((ct * TILE,), jnp.bool_)
        out_like = jax.eval_shape(fn, chunk_in, lane_in)

    outs = jax.tree_util.tree_map(
        lambda s: jnp.zeros((R,) + tuple(s.shape[1:]), s.dtype), out_like
    )

    def chunk_body(ci, outs):
        sl = jax.lax.dynamic_slice(tidx, (ci * ct,), (ct,))
        tile_ok = sl < n_tiles
        slc = jnp.minimum(sl, n_tiles - 1)
        lane_ok = jnp.repeat(tile_ok, TILE) & tgather(mask, slc)

        c_in = jax.tree_util.tree_map(lambda a: tgather(a, slc), inputs)
        c_out = fn(c_in, lane_ok)

        def scat(o, c):
            c = jnp.where(
                lane_ok.reshape((ct * TILE,) + (1,) * (c.ndim - 1)), c, 0
            ).astype(o.dtype)
            # flat tile rows: XLA scatters (T, 256*k) rows ~2x faster
            # than (T, 256, k) blocks, and the standalone op resists
            # being fused into a slow elementwise loop
            k = 1
            for s in o.shape[1:]:
                k *= s
            return (
                o.reshape(n_tiles, TILE * k)
                .at[slc]
                .add(c.reshape(ct, TILE * k))
                .reshape(o.shape)
            )

        return jax.tree_util.tree_map(scat, outs, c_out)

    return jax.lax.fori_loop(0, n_chunks, chunk_body, outs)
