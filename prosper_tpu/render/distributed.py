"""Multi-chip rendering: pixel-parallel sharding over a device mesh.

The reference is single-GPU; its scale axes are pixels/tiles/rays
(SURVEY.md §5). On TPU pods the natural production mapping is SPMD
pixel-space decomposition: every chip traces a horizontal band of the
frame with the (small) scene replicated, and frame-level statistics are
combined with psum over ICI. This module builds that step with
jax.sharding.Mesh + shard_map — no NCCL/queue analogs, just XLA
collectives.

Axes:
- "sp": spatial/pixel parallelism (bands of the frame)

Scene replication is the right default below ~1 GB of scene; a geometry-
sharded ("gp") variant can all_gather cluster slabs on demand for huge
scenes (future work, noted in ROADMAP).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .pt import pt_trace_pixels


def make_mesh(n_devices: int | None = None, axis: str = "sp") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devs, (axis,))


def pt_render_sharded(
    mesh: Mesh,
    static_scene: dict,
    frame: dict,
    arena: dict,
    cam: dict,
    width: int,
    height: int,
    frame_index: int,
    max_bounces: int = 2,
):
    """One 1-spp PT sample with pixels sharded over the mesh's "sp" axis.

    Returns ((H*W, 3) color gathered, total ray count psummed over chips).
    """
    n = mesh.shape["sp"]
    R = width * height
    assert R % n == 0, "pixel count must divide the mesh"

    px = jnp.tile(jnp.arange(width, dtype=jnp.uint32), height)
    py = jnp.repeat(jnp.arange(height, dtype=jnp.uint32), width)
    res = jnp.array([width, height], jnp.int32)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("sp"), P("sp"), P()),
        out_specs=(P("sp"), P()),
        # while_loop carries mix replicated loop counters with sharded ray
        # state; skip the varying-manual-axes type check
        check_vma=False,
    )
    def step(static_r, frame_r, arena_r, cam_r, px_s, py_s, res_r):
        color, n_rays = pt_trace_pixels(
            static_r,
            frame_r,
            arena_r,
            cam_r,
            px_s,
            py_s,
            res_r,
            frame_index,
            max_bounces,
        )
        total_rays = jax.lax.psum(n_rays, "sp")
        return color, total_rays

    fn = jax.jit(step)
    return fn(static_scene, frame, arena, cam, px, py, res)


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
