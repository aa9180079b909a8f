"""Regression tests for tile-granular wavefront compaction (ops/compact).

The chunked dispatch slices the live-tile index list in fixed-size
steps; an unpadded list let dynamic_slice clamp the last chunk's start
index, overlapping the previous chunk and double-adding those tiles'
outputs (advisor round-2 high finding). The cases below pin the fix.
"""

import jax.numpy as jnp
import numpy as np

from prosper_tpu.ops.compact import TILE, tile_apply


def _ident(chunk, lane_ok):
    return chunk["x"] * 2.0


def test_no_double_add_when_live_tiles_not_chunk_multiple():
    # 3 live tiles, chunk_tiles=2 -> 2 chunks; before the fix the second
    # chunk's dynamic_slice clamped to [1, 2] and tile 1 was added twice.
    n_tiles = 3
    R = n_tiles * TILE
    x = jnp.arange(R, dtype=jnp.float32) + 1.0
    mask = jnp.ones((R,), bool)
    out = tile_apply(mask, _ident, {"x": x}, chunk_tiles=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


def test_no_double_add_full_coverage_many_tiles():
    # 1080p-shaped ratio: n_tiles not a multiple of chunk_tiles, all live.
    n_tiles = 13
    R = n_tiles * TILE
    x = jnp.ones((R,), jnp.float32)
    mask = jnp.ones((R,), bool)
    out = tile_apply(mask, _ident, {"x": x}, chunk_tiles=4)
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_sparse_tiles_untouched():
    n_tiles = 7
    R = n_tiles * TILE
    x = jnp.arange(R, dtype=jnp.float32)
    mask = jnp.zeros((R,), bool).at[TILE * 2 : TILE * 2 + 5].set(True)
    out = tile_apply(mask, _ident, {"x": x}, chunk_tiles=3)
    expect = np.zeros(R, np.float32)
    expect[TILE * 2 : TILE * 2 + 5] = np.arange(
        TILE * 2, TILE * 2 + 5, dtype=np.float32
    ) * 2.0
    np.testing.assert_allclose(np.asarray(out), expect)
