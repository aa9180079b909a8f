"""BVH construction over cluster AABBs (host side).

Replaces the Vulkan driver's BLAS/TLAS builds
(/root/reference/src/scene/World.cpp:538-802: <=10 BLAS builds/frame,
TLAS rebuilt every frame). Our two-level design flattens instances:
every frame the per-mesh cluster AABBs are transformed to world space and
a single shallow BVH2 is rebuilt over all (instance, cluster) leaves —
the "TLAS" — while triangle data is re-transformed on device in the same
jit step. Cluster counts are ~tris/124, so this build is a few thousand
nodes and takes well under a millisecond in vectorised numpy.

Node layout (SoA, flat arrays, friendly to jnp.take gathers and Pallas
scalar prefetch):
- nodes_min/nodes_max: (N, 3) f32
- nodes_left:  (N,) i32 — internal: left child index (right = left+1 is NOT
  assumed; right stored separately for topology freedom)
- nodes_right: (N,) i32
- nodes_first/nodes_count: (N,) i32 — leaf cluster range in *reordered*
  cluster order; internal nodes have count == 0
The builder also returns `order`, the permutation of input AABBs such that
each leaf covers a contiguous range.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Bvh:
    nodes_min: np.ndarray
    nodes_max: np.ndarray
    nodes_left: np.ndarray
    nodes_right: np.ndarray
    nodes_first: np.ndarray
    nodes_count: np.ndarray
    order: np.ndarray  # (C,) input-index per reordered slot
    depth: int

    @property
    def n_nodes(self) -> int:
        return len(self.nodes_left)


def build_bvh(
    aabb_min: np.ndarray,
    aabb_max: np.ndarray,
    max_leaf_size: int = 4,
) -> Bvh:
    """Median-split BVH2 (surface-area-informed axis choice).

    Median split over the widest centroid axis gives balanced depth
    (important: traversal loops are bounded by depth on TPU) and good
    quality for cluster-level BVHs where leaves are already fat.
    """
    n = len(aabb_min)
    assert n > 0
    cent = (aabb_min + aabb_max) * 0.5

    # Worst case nodes = 2*ceil(n/1) but with max_leaf_size leaves it's less;
    # allocate generously and trim.
    cap = max(2 * n, 16)
    nodes_min = np.empty((cap, 3), np.float32)
    nodes_max = np.empty((cap, 3), np.float32)
    nodes_left = np.full(cap, -1, np.int32)
    nodes_right = np.full(cap, -1, np.int32)
    nodes_first = np.zeros(cap, np.int32)
    nodes_count = np.zeros(cap, np.int32)

    order = np.arange(n)
    n_nodes = 0
    max_depth = 0

    # iterative build: stack of (node_index, start, end, depth)
    def alloc() -> int:
        nonlocal n_nodes
        i = n_nodes
        n_nodes += 1
        return i

    root = alloc()
    stack = [(root, 0, n, 1)]
    while stack:
        node, s, e, depth = stack.pop()
        max_depth = max(max_depth, depth)
        idx = order[s:e]
        mn = aabb_min[idx].min(axis=0)
        mx = aabb_max[idx].max(axis=0)
        nodes_min[node] = mn
        nodes_max[node] = mx
        count = e - s
        if count <= max_leaf_size:
            nodes_first[node] = s
            nodes_count[node] = count
            continue
        c = cent[idx]
        ext = c.max(axis=0) - c.min(axis=0)
        axis = int(np.argmax(ext))
        mid = count // 2
        if ext[axis] <= 1e-12:
            # all centroids identical (e.g. unstreamed degenerate
            # clusters): split by index — keeps leaves <= max_leaf_size
            # (traversal kernels require exactly one cluster per leaf)
            part = np.arange(count)
        else:
            part = np.argpartition(c[:, axis], mid)
        order[s:e] = idx[part]
        left = alloc()
        right = alloc()
        nodes_left[node] = left
        nodes_right[node] = right
        stack.append((left, s, s + mid, depth + 1))
        stack.append((right, s + mid, e, depth + 1))

    return Bvh(
        nodes_min=nodes_min[:n_nodes].copy(),
        nodes_max=nodes_max[:n_nodes].copy(),
        nodes_left=nodes_left[:n_nodes].copy(),
        nodes_right=nodes_right[:n_nodes].copy(),
        nodes_first=nodes_first[:n_nodes].copy(),
        nodes_count=nodes_count[:n_nodes].copy(),
        order=order,
        depth=max_depth,
    )


def pack_nodes(bvh: Bvh) -> tuple[np.ndarray, np.ndarray]:
    """Kernel-facing node arrays for ops/trace_bvh.py.

    Returns (bounds (N, 6) f32 [min.xyz | max.xyz],
             meta (N, 3) i32 [left, right, leaf_cluster(-1 internal)]).
    Requires max_leaf_size == 1 builds (one cluster per leaf).
    """
    assert bvh.nodes_count.max() <= 1, "pack_nodes requires max_leaf_size=1"
    bounds = np.concatenate([bvh.nodes_min, bvh.nodes_max], axis=1).astype(
        np.float32
    )
    cluster = np.where(
        bvh.nodes_count > 0, bvh.order[bvh.nodes_first], -1
    ).astype(np.int32)
    meta = np.stack([bvh.nodes_left, bvh.nodes_right, cluster], axis=1).astype(
        np.int32
    )
    return bounds, meta


def transform_aabbs(
    aabb_min: np.ndarray, aabb_max: np.ndarray, m: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Conservative AABB transform by a 4x4 (TLAS instance transform).

    Uses the |R| trick: new_extent = |M3x3| @ extent.
    """
    c = (aabb_min + aabb_max) * 0.5
    e = (aabb_max - aabb_min) * 0.5
    r = m[:3, :3]
    new_c = c @ r.T + m[:3, 3]
    new_e = e @ np.abs(r).T
    return (new_c - new_e).astype(np.float32), (new_c + new_e).astype(np.float32)
