"""Leaf-major wavefront traversal for incoherent rays (bounce/shadow).

The packet kernels in ops/trace_bvh.py collapse on hemisphere-divergent
wavefronts: a 256-ray packet's AABB union visits ~90 of FlightHelmet's
766 leaves while each individual ray only enters ~10, so ~95% of the
Moller lanes and leaf DMAs are wasted (scripts/bench_bounce.py). This
module splits traversal the TPU-friendly way:

1. `walk_leaves` — a per-LANE stackless threaded-BVH walk (each of 128
   lanes follows its own ray through the preorder/skip table packed by
   accel.bvh.pack_threaded, fetching its own node's 8 fields with ONE
   take_along_axis lane-gather per 128-node chunk). Output: per-ray
   candidate leaf lists (R, L).
2. XLA glue — flatten to (ray, leaf) pairs, sort by leaf, pad each
   leaf's run to 256-pair tiles.
3. `moller_pairs` — every 256-pair tile shares ONE leaf: one slab DMA +
   one (256, 128) Moller where every lane is useful work.

The reference gets this for free from per-thread hardware BVH traversal
(/root/reference/src/render/RtReference.cpp:301-527); on a vector
machine the leaf-major regrouping is what removes the packet-union
waste.

STATUS — measured and shelved. The per-lane walk is CORRECT on TPU
(tested vs walk_leaves_ref) and confirms the waste hypothesis
(mean 11.2 leaves/ray vs ~90 union visits/packet on FlightHelmet bounce
wavefronts), but the walk alone costs 91 ms for 71k rays — more than
the whole packet trace (62 ms) — because each step pays n_chunks
take_along_axis lane-gathers plus Mosaic while-loop overhead, pinned by
the slowest of 128 lanes. Lesson recorded for round 3: on this VPU,
per-lane pointer chasing loses to packet work even at 8x logical waste;
a faster path needs either a hardware sublane gather or a fundamentally
batched reformulation. The packet kernels in ops/trace_bvh.py remain
the production path; stages 2-3 (pair sort + moller_pairs) were not
built.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L_CAP = 32  # per-ray candidate-leaf capacity (overflow detected)
_BLOCKS_PER_STEP = 8  # 128-ray blocks per grid step


def _prep_walk(ray_o, ray_d, t_max):
    R0 = ray_o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R0,))
    pad = (-R0) % (128 * _BLOCKS_PER_STEP)
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), jnp.float32)])
        ray_d = jnp.concatenate([ray_d, jnp.zeros((pad, 3), jnp.float32)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), jnp.float32)])
    R = ray_o.shape[0]
    inv_d = jnp.where(jnp.abs(ray_d) > 1e-12, 1.0 / ray_d, jnp.float32(1e30))
    feat = jnp.concatenate(
        [ray_o, inv_d, t_max[:, None], jnp.zeros((R, 1), jnp.float32)],
        axis=1,
    )  # (R, 8)
    rows = feat.reshape(R // 128, 128, 8).transpose(0, 2, 1)  # (B, 8, 128)
    return R0, R, rows


def _walk_kernel(n_nodes: int, n_chunks: int, l_cap: int):
    big = jnp.int32(2**30)

    def kernel(rays_ref, table_ref, out_ref, cnt_ref):
        def block_body(b, _):
            ox = rays_ref[b, 0:1, :]
            oy = rays_ref[b, 1:2, :]
            oz = rays_ref[b, 2:3, :]
            ix = rays_ref[b, 3:4, :]
            iy = rays_ref[b, 4:5, :]
            iz = rays_ref[b, 5:6, :]
            tmax = rays_ref[b, 6:7, :]

            cur0 = jnp.where(tmax > 0.0, 0, n_nodes).astype(jnp.int32)

            def cond(st):
                return jnp.any(st[0] < n_nodes)

            def body(st):
                cur, cnt, leaves = st
                live = cur < n_nodes
                cur_lo = jnp.min(cur)
                cur_hi = jnp.max(jnp.where(live, cur, 0))
                c_lo = cur_lo // 128
                c_hi = cur_hi // 128 + 1

                def fetch(c, f):
                    tab = table_ref[c]
                    idx = jnp.broadcast_to(
                        jnp.clip(cur - c * 128, 0, 127), (8, 128)
                    )
                    g = jnp.take_along_axis(tab, idx, axis=1)
                    m = (cur >= c * 128) & (cur < (c + 1) * 128)
                    return jnp.where(m, g, f)

                f = jax.lax.fori_loop(
                    c_lo, c_hi, fetch, jnp.zeros((8, 128), jnp.float32)
                )
                t0x = (f[0:1] - ox) * ix
                t1x = (f[3:4] - ox) * ix
                t0y = (f[1:2] - oy) * iy
                t1y = (f[4:5] - oy) * iy
                t0z = (f[2:3] - oz) * iz
                t1z = (f[5:6] - oz) * iz
                enter = jnp.maximum(
                    jnp.maximum(
                        jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)
                    ),
                    jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
                )
                exit_ = jnp.minimum(
                    jnp.minimum(
                        jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)
                    ),
                    jnp.maximum(t0z, t1z),
                )
                hit = (enter <= exit_) & (enter < tmax) & live
                leafv = f[7:8].astype(jnp.int32)
                at_leaf = hit & (leafv >= 0)
                new_leaves = [
                    jnp.where(at_leaf & (cnt == j), leafv, leaves[j])
                    for j in range(l_cap)
                ]
                cnt = cnt + at_leaf.astype(jnp.int32)
                skipv = f[6:7].astype(jnp.int32)
                cur = jnp.where(
                    live, jnp.where(hit, cur + 1, skipv), n_nodes
                )
                return cur, cnt, tuple(new_leaves)

            init = (
                cur0,
                jnp.zeros((1, 128), jnp.int32),
                tuple(
                    jnp.full((1, 128), -1, jnp.int32) for _ in range(l_cap)
                ),
            )
            cur, cnt, leaves = jax.lax.while_loop(cond, body, init)
            out_ref[b] = jnp.concatenate(list(leaves), axis=0)
            cnt_ref[b] = cnt
            return 0

        jax.lax.fori_loop(0, _BLOCKS_PER_STEP, block_body, 0)

    del big
    return kernel


@partial(jax.jit, static_argnames=("l_cap",))
def walk_leaves(table, ray_o, ray_d, t_max, l_cap: int = L_CAP):
    """Per-ray candidate leaves: (R, l_cap) i32 (-1 padding) + (R,)
    counts (count > l_cap means the list overflowed and the caller must
    fall back for those rays)."""
    n_chunks = table.shape[0]
    n_nodes = n_chunks * 128
    R0, R, rows = _prep_walk(ray_o, ray_d, t_max)
    B = R // 128
    grid = (B // _BLOCKS_PER_STEP,)
    out, cnt = pl.pallas_call(
        _walk_kernel(n_nodes, n_chunks, l_cap),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (_BLOCKS_PER_STEP, 8, 128),
                    lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (n_chunks, 8, 128),
                    lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (_BLOCKS_PER_STEP, l_cap, 128),
                    lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (_BLOCKS_PER_STEP, 1, 128),
                    lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, l_cap, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
        ],
    )(rows, table)
    leaves = out.transpose(0, 2, 1).reshape(R, l_cap)[:R0]
    counts = cnt.reshape(R)[:R0]
    return leaves, counts


def walk_leaves_ref(table, ray_o, ray_d, t_max, l_cap: int = L_CAP):
    """XLA reference of walk_leaves (slow; tests + CPU fallback)."""
    import numpy as np

    tab = np.asarray(table).transpose(0, 2, 1).reshape(-1, 8)
    n_nodes = tab.shape[0]
    R = ray_o.shape[0]
    t_max = np.broadcast_to(np.asarray(t_max, np.float32), (R,))
    o = np.asarray(ray_o)
    d = np.asarray(ray_d)
    inv = np.where(np.abs(d) > 1e-12, 1.0 / d, 1e30)
    leaves = np.full((R, l_cap), -1, np.int32)
    counts = np.zeros(R, np.int32)
    for r in range(R):
        if t_max[r] <= 0:
            continue
        curn = 0
        while curn < n_nodes:
            f = tab[curn]
            t0 = (f[0:3] - o[r]) * inv[r]
            t1 = (f[3:6] - o[r]) * inv[r]
            enter = max(np.minimum(t0, t1).max(), 0.0)
            exit_ = np.maximum(t0, t1).min()
            hit = enter <= exit_ and enter < t_max[r]
            if hit and f[7] >= 0:
                if counts[r] < l_cap:
                    leaves[r, counts[r]] = int(f[7])
                counts[r] += 1
            curn = curn + 1 if hit else int(f[6])
    return leaves, counts


# --- moved from prosper_tpu/accel/bvh.py when this family was archived
# (only consumer was the walk kernel above); needs `from .bvh import Bvh`
# context when restored.
def pack_threaded(bvh: Bvh) -> np.ndarray:
    """Preorder threaded node table for the per-ray walk kernel
    (ops/trace_wavefront.py).

    Returns (n_chunks, 8, 128) f32: chunk c, field row f, node lane l is
    field f of preorder node c*128+l. Field rows: [min.x, min.y, min.z,
    max.x, max.y, max.z, skip, leaf]. The stackless walk is: on AABB hit
    go to node+1 (preorder first child; a leaf's subtree is itself so +1
    == skip), on miss go to skip (first node after the subtree); node ==
    N terminates. skip/leaf ride as exact f32 integers (N < 2^24).
    Requires max_leaf_size == 1 builds. See e.g. Smits 1998 /
    Torres et al. threaded-BVH traversal for the classic CPU/GPU form.
    """
    assert bvh.nodes_count.max() <= 1
    n = bvh.n_nodes
    pre = np.empty(n, np.int32)  # old index -> preorder position
    skip = np.empty(n, np.int32)  # by preorder position
    n_chunks = -(-n // 128)
    n_term = n_chunks * 128  # the kernel's termination bound
    pos = 0
    stack = [(0, n_term)]  # (old node, skip target in preorder positions)
    # iterative DFS; "after" = preorder position after this subtree is
    # not known until the subtree is emitted, so pass the parent's skip
    # and patch: emit left with skip=right's future position — resolved
    # by emitting right subtree size first via a sizes pass
    sizes = np.ones(n, np.int64)
    # subtree sizes bottom-up (children indices are always > parent in
    # the builder's allocation order? not guaranteed by pop order — use
    # a post-order walk instead)
    order_stack = [0]
    post = []
    while order_stack:
        i = order_stack.pop()
        post.append(i)
        if bvh.nodes_count[i] == 0:
            order_stack.append(bvh.nodes_left[i])
            order_stack.append(bvh.nodes_right[i])
    for i in reversed(post):
        if bvh.nodes_count[i] == 0:
            sizes[i] = 1 + sizes[bvh.nodes_left[i]] + sizes[bvh.nodes_right[i]]
    while stack:
        i, after = stack.pop()
        pre[i] = pos
        skip[pos] = after
        pos += 1
        if bvh.nodes_count[i] == 0:
            left, right = bvh.nodes_left[i], bvh.nodes_right[i]
            # left occupies [pos, pos+sizes[left]) then right
            stack.append((right, after))
            stack.append((left, pos + int(sizes[left])))
    inv = np.empty(n, np.int32)
    inv[pre] = np.arange(n, dtype=np.int32)  # preorder position -> old
    leaf = np.where(
        bvh.nodes_count[inv] > 0, bvh.order[bvh.nodes_first[inv]], -1
    )
    table = np.zeros((n_chunks, 8, 128), np.float32)
    flat = np.concatenate(
        [
            bvh.nodes_min[inv],
            bvh.nodes_max[inv],
            skip[:, None].astype(np.float32),
            leaf[:, None].astype(np.float32),
        ],
        axis=1,
    )  # (n, 8)
    pad = n_term - n
    if pad:
        # padded nodes: NaN bounds (slab test: enter<=exit is false, so
        # they can never "hit") jumping to the termination bound
        term = np.zeros((pad, 8), np.float32)
        term[:, 0:6] = np.nan
        term[:, 6] = n_term
        term[:, 7] = -1
        flat = np.concatenate([flat, term], axis=0)
    table[:] = flat.reshape(n_chunks, 128, 8).transpose(0, 2, 1)
    return table
