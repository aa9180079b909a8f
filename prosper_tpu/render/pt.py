"""Wavefront path tracer — reference-mode parity.

Algorithm parity with /root/reference/res/shader/rt/reference/main.rgen:
- pcg_state = uvec3(px, frameIndex); jittered uv (:227-231)
- pinhole or thin-lens primary rays (:236-240)
- per bounce: closest hit -> direct light (uniform light pick + shadow ray
  with tMin 0.1, :196-226) -> diffuse/specular one-sample MIS bounce
  (cosine hemisphere vs VNDF, 50/50 or specular-only when metallic>0.999,
  :92-144) -> Russian roulette after rouletteStartBounce (:270-276)
- indirect clamp to [0,2] when enabled (:84-89)
- running-mean accumulation with history count (:284-297)
- Wächter-Binder ray offset between bounces (:278)

RNG stream order matches the GLSL call-for-call so fp32 sample streams
line up: uv jitter (1 advance), [lens (1)], then per bounce: light pick
(1), bounce pick (1), bounce dir (1), [roulette (1)].

TPU-first structure: the primary trace runs dense over all pixels; the
rest of the frame (surface eval, NEE, bounce traces) runs on a
tile-compacted wavefront. Pixels are traced in 256-ray tiles (16x16
screen blocks); tiles with no primary hit are dropped by a prefix-sum
compaction over TILE-granular masks (cheap: ~R/256 elements), and the
surviving tiles are processed in fixed-capacity chunks with a DYNAMIC
chunk count (lax.fori_loop with a traced bound). On sparse scenes this
removes ~(1 - coverage) of all texture taps, BRDF math and shadow rays;
on full-coverage scenes it degrades to the dense cost plus a ~ms of
compaction. This is the TPU analog of the reference megakernel's early
ray termination (rays that miss never run the hit shader).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from ..mathx import rng as prng
from ..ops import trace
from ..ops.brdf import (
    cook_torrance_brdf,
    cosine_hemisphere_pdf,
    cosine_sample_hemisphere,
    eval_brdf_times_nol,
    fresnel_zero,
    lambert_brdf,
    orthonormal_basis,
    sample_visible_trowbridge_reitz,
    saturate,
    visible_trowbridge_reitz_pdf,
)
from ..ops.rays import offset_ray, pinhole_rays, thin_lens_rays
from ..ops.tonemap import tone_map
from .shading import sample_light
from .surface import evaluate_surface

ROULETTE_START_BOUNCE = 1  # reference UI default (RtReference.hpp)
PT_INNER_COMPACT = True  # per-bounce tile re-compaction (A/B flag)
# stage-isolation knobs for device bisection (scripts only; all True in
# production)
PT_DEBUG_SHADOW = True
PT_DEBUG_BOUNCE = True
PT_DEBUG_SURFACE = True
# The packet/leafmajor bounce-tracer preference lives in
# config.policy.bounce_tracer (the --bounce-tracer CLI flag); packet is
# the measured default — numbers next to the knob in config.KernelPolicy.


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


@lru_cache(maxsize=4)
def _packed_pixels(width: int, height: int):
    """Static in-kernel-raygen pixel layouts for the block16 pixel order
    (ops.trace_bvh.pack_pixels_np) + per-ray-tile pixel bounds
    (tile_px_bounds_np, feeds the primary tile mask), cached per
    resolution. Returns (cols, rows, tile_px, R0)."""
    from ..ops.trace_bvh import pack_pixels_np, tile_px_bounds_np

    px_np, py_np, _ = trace.block_pixel_order(width, height)
    cols, rows, r0 = pack_pixels_np(px_np, py_np)
    return cols, rows, tile_px_bounds_np(px_np, py_np), r0


def pt_trace_pixels(
    static_scene: dict,
    frame: dict,
    arena: dict,
    cam: dict,
    px: jnp.ndarray,
    py: jnp.ndarray,
    resolution: jnp.ndarray,
    frame_index,
    max_bounces: int = 3,
    use_dof: bool = False,
    clamp_indirect: bool = False,
    env: jnp.ndarray | None = None,
    alpha_rounds: int = 0,
    chunk_tiles: int = 512,
    pix_packed=None,
):
    """Path-trace an arbitrary flat pixel list -> ((R,3) color, ray count).

    pix_packed: optional (cols, rows) static pixel layouts from
    ops.trace_bvh.pack_pixels_np matching (px, py) — enables in-kernel
    primary ray generation on the full-kernel path (no 2M-ray prep).

    alpha_rounds > 0 enables stochastic-alpha any-hit parity
    (scene.rahit): ignored hits (failed mask test, or blend alpha below a
    per-ray uniform) re-trace from just past the hit, up to alpha_rounds
    times. The per-ray uniform is fixed per traceRay like the reference's
    payload.randomSeed (scene.rahit:33-38).

    After the dense primary trace, shading and bounces run on a
    tile-compacted wavefront: 256-ray tiles with no hit are dropped by a
    prefix-sum over ~R/256 tile flags, and survivors are processed in
    chunks of `chunk_tiles` tiles with a dynamic lax.fori_loop trip count
    (see module docstring). Per-pixel RNG streams ride the compaction, so
    results are bit-identical to the dense loop.

    Taking explicit pixel coordinates makes the kernel shardable: each
    device of a mesh traces its own pixel slice (render/distributed.py),
    the multi-chip strategy standing in for the reference's single-GPU
    viewport (SURVEY.md §5 "sharding axes: pixels/tiles/rays").
    """
    TILE = 256
    if env is not None and env.ndim != 2:
        # quad-pack the cubemap ONCE: sample_cubemap repacking inside the
        # per-chunk/per-bounce fori_loop bodies costs 4x the cubemap's
        # memory traffic per trace step (XLA cannot hoist it out of the
        # loop-carried bodies)
        from ..ops.ibl import pack_cubemap_rows

        env = pack_cubemap_rows(env)
    R0 = px.shape[0]
    pad = (-R0) % TILE
    if pad:
        px = jnp.concatenate([px, jnp.broadcast_to(px[:1], (pad,))])
        py = jnp.concatenate([py, jnp.broadcast_to(py[:1], (pad,))])
    R = px.shape[0]
    n_tiles = R // TILE
    CT = min(chunk_tiles, n_tiles)
    width, height = resolution[0], resolution[1]
    def primary_streams(px_, py_):
        """Per-pixel RNG state + primary ray for (px_, py_) — the
        reference's camera stream (main.rgen rnd2d01 jitter, then the
        optional thin-lens draw). Pure elementwise math, so the chunk
        loop below recomputes its own slice instead of gathering nine
        channels of full-frame tile views (state u32x3 + o/d f32x3 each
        materialized a T(4,128)->T(8,128) relayout copy at 1080p —
        ~1.6 ms per array in the round-4 xplane)."""
        st = prng.make_state(px_, py_, jnp.uint32(frame_index))
        st, jitter = prng.rnd2d01(st)
        uvj = (
            jnp.stack([px_, py_], axis=-1).astype(jnp.float32) + jitter
        ) / jnp.stack([width, height]).astype(jnp.float32)
        if use_dof:
            st, lens = prng.rnd2d01(st)
            o_, d_ = thin_lens_rays(cam, uvj, lens)
        else:
            o_, d_ = pinhole_rays(cam, uvj)
        return st, o_, d_

    geom = trace.frame_geometry(static_scene, frame)
    tris = geom["tris"]
    wc_min = frame["wc_aabb_min_w"]
    wc_max = frame["wc_aabb_max_w"]
    bvh = trace.frame_bvh(frame)
    trace_closest_fn, trace_any_fn = trace.make_tracer(
        tris, wc_min, wc_max, bvh=bvh, packed9=geom.get("packed9")
    )
    use_full_kernel = jax.default_backend() != "cpu"
    if use_full_kernel:
        # fused hit+attribute kernel: surface attributes come out of the
        # traversal's VMEM registers instead of post-pass XLA gathers
        from functools import partial as _partial

        from ..ops.trace_pallas_full import pack_tris_full, trace_closest_full

        packed_full = geom.get("packed_full")
        if packed_full is None:
            packed_full = pack_tris_full(static_scene, frame)
        if bvh is not None:
            from ..ops.trace_bvh import trace_closest_bvh_full

            trace_closest_fn = _partial(
                trace_closest_bvh_full, packed_full, bvh[0], bvh[1]
            )
        else:
            trace_closest_fn = _partial(
                trace_closest_full, packed_full, wc_min, wc_max
            )
    lights = frame["lights"]
    light_count = (1 + lights["point_count"] + lights["spot_count"]).astype(
        jnp.float32
    )
    # wavefront-scale coherence sort feeds the Pallas packet kernels; the
    # CPU/XLA reference tracer is order-independent
    sort_rays = use_full_kernel
    # incoherent bounce/shadow rays ride the leaf-major pair tracer
    # (ops/trace_leafmajor.py): per-leaf dense Möller blocks over exactly
    # the candidate (ray, leaf) pairs instead of hemisphere packets that
    # union-visit ~16x what each ray needs. Primary rays stay on the
    # packet BVH kernel (coherent packets amortize perfectly there).
    # The leafmajor/packet decision lives in ops/trace.make_bounce_tracer
    # (one policy; overflow-exact via the *_safe packet fallback).
    bounce_tr = (
        trace.make_bounce_tracer(packed_full, wc_min, wc_max, bvh)
        if use_full_kernel
        else None
    )
    leafmajor = bounce_tr is not None
    if leafmajor:
        sort_rays = False  # pair blocks need no ray-order coherence
    # incoherent wavefronts run the BVH kernels at a smaller packet size
    # (the flat cull-list fallback kernels don't take tile)
    bounce_tile = trace.BOUNCE_TILE if (sort_rays and bvh is not None) else None
    # bounce closest traces run the PLAIN 9-row kernel and defer the
    # attribute interpolation to ONE post-trace row gather
    # (trace_bvh.attrs_from_hit_rows): the fused kernel's per-visit
    # attribute DMA + interp/select block is pure overhead on incoherent
    # packets, which union-visit ~27 leaves per 128 rays but observe
    # only the final hit's attributes. Primary rays keep the fused
    # kernel (coherent packets amortize the per-visit cost over ~1
    # visit, and the dense 2M-ray post-pass gather would dominate).
    bounce_deferred_attrs = sort_rays and bvh is not None
    if bounce_deferred_attrs:
        attr_rows = geom.get("attr_rows")
        if attr_rows is None:
            from ..ops.trace_bvh import attr_rows_from_packed

            attr_rows = attr_rows_from_packed(packed_full)

    def alpha_retrace(state, o, d, tmax, hit):
        """The stochastic any-hit retrace loop (scene.rahit): ignored
        hits (failed mask test / blend alpha below the per-ray uniform)
        re-trace from just past the hit."""
        from ..ops.texture import sample_alpha_packed

        # fixed per-ray uniform: pcg(state.x ^ state.z) (no advance),
        # the payload.randomSeed convention
        seed = prng.pcg(state[..., 0] ^ state[..., 2])
        au = prng.rng_to01(seed)
        t_off = jnp.zeros_like(hit["t"])
        o_cur = o
        tmax_cur = tmax
        for _ in range(alpha_rounds):
            a = sample_alpha_packed(arena, hit["material"], hit["uv"])
            ignore = (hit["tri"] >= 0) & (
                (a == 0.0) | ((a > 0.0) & (au > a))
            )
            adv = jnp.where(ignore, hit["t"] * (1.0 + 1e-4) + 1e-5, 0.0)
            o_cur = o_cur + d * adv[..., None]
            tmax_cur = jnp.where(
                ignore, jnp.maximum(tmax_cur - adv, 0.0), 0.0
            )
            t_off = t_off + adv
            hit2 = trace_closest_fn(o_cur, d, 0.0, tmax_cur)
            hit = {
                k: jnp.where(
                    ignore.reshape(
                        ignore.shape + (1,) * (hit[k].ndim - 1)
                    ),
                    hit2[k],
                    hit[k],
                )
                for k in hit
            }
        hit = dict(hit)
        hit["t"] = hit["t"] + t_off
        return hit

    def trace_with_alpha(state, o, d, tmax, perm=None, inv=None,
                         compact=False, tile=None, hit=None):
        """traceRay + the stochastic any-hit retrace loop (scene.rahit).

        perm/inv: optional coherence-sort permutation; the sort is fused
        into the kernel's ray prep (one row gather) and the packed hit
        rows are unsorted with one more, so sorting costs ~2 gathers
        total. Alpha retraces run unsorted (rare, correctness-equal).
        compact=True runs the retrace loop tile-compacted on hit tiles —
        for the DENSE primary trace the loop's alpha taps and re-trace
        prep would otherwise run on every pixel (~150 ms/frame at 1080p
        for a 6%-coverage scene). tile: kernel packet size override for
        incoherent wavefronts (trace.BOUNCE_TILE). hit: precomputed hit
        dict (the in-kernel-raygen primary path) — skips the trace and
        runs only the alpha loop."""
        kw = {"tile": tile} if tile is not None else {}
        if hit is not None:
            pass
        elif perm is not None:
            from ..ops.trace_bvh import unpack_hit16

            h16 = trace_closest_fn(
                o, d, 0.0, tmax, perm=perm, packed=True, **kw
            )
            hit = unpack_hit16(h16[inv])
        else:
            hit = trace_closest_fn(o, d, 0.0, tmax, **kw)
        if alpha_rounds and use_full_kernel:
            if compact:
                from ..ops.compact import tile_apply

                mask = hit["tri"] >= 0

                def _fn(c_in, lane_ok):
                    c_state, c_o, c_d, c_tmax, c_hit = c_in
                    return alpha_retrace(
                        c_state, c_o, c_d,
                        jnp.where(lane_ok, c_tmax, 0.0), c_hit,
                    )

                out = tile_apply(mask, _fn, (state, o, d, tmax, hit))
                hit = {
                    k: jnp.where(
                        mask.reshape(mask.shape + (1,) * (hit[k].ndim - 1)),
                        out[k],
                        hit[k],
                    )
                    for k in hit
                }
            else:
                hit = alpha_retrace(state, o, d, tmax, hit)
        return hit

    def _sort_key(origin_cluster, d, live):
        """Ray-coherence sort key: (origin cluster, direction octant).

        At wavefront scale (<=262k rays) an argsort costs ~1.4 ms, while
        packing rays that leave the same cluster in the same direction
        into the same 256-ray packet cuts the BVH kernel's per-packet
        leaf visits several-fold (round-1's full-frame sort lost only
        because it paid 2M-scale sort/permute costs)."""
        ad = jnp.abs(d)
        denom = jnp.maximum(ad[:, 0] + ad[:, 1] + ad[:, 2], 1e-20)
        ox = d[:, 0] / denom
        oy = d[:, 1] / denom
        fold = d[:, 2] < 0.0
        ox2 = jnp.where(fold, (1.0 - jnp.abs(oy)) * jnp.sign(ox), ox)
        oy2 = jnp.where(fold, (1.0 - jnp.abs(ox)) * jnp.sign(oy), oy)
        bx = jnp.clip(((ox2 * 0.5 + 0.5) * 8).astype(jnp.int32), 0, 7)
        by = jnp.clip(((oy2 * 0.5 + 0.5) * 8).astype(jnp.int32), 0, 7)
        octant = (bx * 8 + by) * 2 + fold.astype(jnp.int32)
        # cluster-major: bounce/shadow rays mostly hit geometry near the
        # surface they leave, so origin locality beats direction
        # coherence (measured: cluster-major 5.0 vs direction-major
        # 4.1 Mrays/s on the 1080p FlightHelmet bench)
        return jnp.where(live, origin_cluster * 128 + octant, jnp.int32(2**30))

    def _sorted(key):
        perm = jnp.argsort(key)
        inv = (
            jnp.zeros_like(perm)
            .at[perm]
            .set(jnp.arange(perm.shape[0], dtype=perm.dtype))
        )
        return perm, inv

    def miss_hit_like(hit, tmax):
        out = {}
        for k, v in hit.items():
            if k == "t":
                out[k] = tmax
            elif k == "tri":
                out[k] = jnp.full_like(v, -1)
            else:
                out[k] = jnp.zeros_like(v)
        return out

    def shade_and_bounce(bounce, state, color, throughput, active, ray_o,
                         ray_d, hit):
        """Shade one wavefront's hits + generate its bounce rays.

        `bounce` is the hit's bounce index (0 = primary). Everything is
        math-identical to the reference per-pixel loop body
        (main.rgen:196-276); see the RNG-parity notes in the docstrings.
        """
        hit_valid = (hit["tri"] >= 0) & active
        if not PT_DEBUG_SURFACE:
            R_ = ray_o.shape[0]
            surface = {
                "position_ws": ray_o + hit["t"][..., None] * ray_d,
                "normal_ws": jnp.broadcast_to(
                    jnp.array([0.0, 1.0, 0.0]), (R_, 3)
                ),
                "inv_view_ray": -ray_d,
                "NoV": jnp.full((R_,), 0.5),
                "albedo": jnp.full((R_, 3), 0.5),
                "roughness": jnp.full((R_,), 0.5),
                "metallic": jnp.zeros((R_,)),
                "alpha": jnp.ones((R_,)),
            }
        elif use_full_kernel:
            from .. import config
            from .surface import evaluate_surface_from_attrs

            # Secondary surfaces sample at one coarse mip
            # (config.policy.bounce_tap_mip): see sample_material_packed.
            # Primary (bounce 0) stays at base mip for pixel parity.
            mip = config.policy.bounce_tap_mip if bounce > 0 else None
            surface = evaluate_surface_from_attrs(
                arena, ray_o, ray_d, hit,
                fixed_mip=mip if mip and mip > 0 else None,
            )
        else:
            surface = evaluate_surface(
                static_scene, frame, arena, ray_o, ray_d, hit
            )

        # ---- direct lighting (main.rgen:196-226) ----
        # The reference's evaluateDirectLighting returns before its rnd01
        # when the surface alpha == 0 (failed mask test) and is never
        # called on miss, so the light-pick advance is masked per ray to
        # keep bit-exact stream parity on paths through alpha==0 hits.
        state_dl, pick = prng.rnd01(state)
        adv_dl = hit_valid & (surface["alpha"] != 0.0)
        state = jnp.where(adv_dl[..., None], state_dl, state)
        light_index = jnp.minimum(
            (pick * light_count).astype(jnp.uint32),
            (light_count - 1.0).astype(jnp.uint32),
        ).astype(jnp.int32)
        l, dist, irradiance = sample_light(
            lights, light_index, surface["position_ws"]
        )
        front = _dot(l, surface["normal_ws"]) > 0.0
        need_shadow = hit_valid & front & (surface["alpha"] != 0.0)
        # Rays that don't need a shadow keep a finite origin/direction
        # (miss rays have inf positions that would poison packet bounds)
        # and are disabled via t_max = 0, which keeps the conservative
        # cull tight instead of degenerating to all-clusters.
        shadow_o = jnp.where(
            need_shadow[..., None], surface["position_ws"], ray_o
        )
        shadow_d = jnp.where(need_shadow[..., None], l, ray_d)
        shadow_tmax = jnp.where(need_shadow, dist, 0.0)
        if not PT_DEBUG_SHADOW:
            occluded = jnp.zeros_like(need_shadow)
        elif leafmajor:
            occluded = bounce_tr["any"](shadow_o, shadow_d, 0.1, shadow_tmax)
        elif sort_rays:
            s_cluster = jnp.maximum(hit["tri"], 0) // trace.CLUSTER_PAD
            perm, inv = _sorted(_sort_key(s_cluster, shadow_d, need_shadow))
            # shadow rays stay at tile=256: they converge on one light
            # (directional: parallel), so packets are coherent and
            # halving them only doubles descent work (measured 10.6 ->
            # 12.6 ms on the FlightHelmet shadow batch)
            occluded = trace_any_fn(
                shadow_o, shadow_d, 0.1, shadow_tmax, perm=perm
            )[inv]
        else:
            occluded = trace_any_fn(shadow_o, shadow_d, 0.1, shadow_tmax)
        vis = jnp.where(need_shadow & ~occluded, 1.0, 0.0)
        direct = (
            throughput
            * irradiance
            * vis[..., None]
            * light_count
            * eval_brdf_times_nol(
                l,
                surface["inv_view_ray"],
                surface["normal_ws"],
                surface["albedo"],
                surface["roughness"],
                surface["metallic"],
            )
        )
        contrib = jnp.where(hit_valid[..., None], direct, 0.0)
        if clamp_indirect:
            contrib = jnp.where(
                bounce > 0, jnp.clip(contrib, 0.0, 2.0), contrib
            )
        color = color + contrib

        # ---- bounce importance sampling (main.rgen:92-144) ----
        state, pick_u = prng.rnd01(state)
        state, samp = prng.rnd2d01(state)

        specular_only = surface["metallic"] > 0.999
        specular_weight = jnp.where(specular_only, 1.0, 0.5)
        diffuse_weight = 1.0 - specular_weight
        pick_diffuse = pick_u < diffuse_weight

        basis = orthonormal_basis(surface["normal_ws"])  # (R, 3, 3)
        v_basis = jnp.einsum(
            "...ij,...j->...i", basis, surface["inv_view_ray"]
        )
        alpha = surface["roughness"] * surface["roughness"]

        # diffuse branch
        rd_diff = cosine_sample_hemisphere(surface["normal_ws"], samp)
        NoL_diff = saturate(_dot(surface["normal_ws"], rd_diff))
        brdf_diff = lambert_brdf(surface["albedo"])
        pdf_diff = cosine_hemisphere_pdf(NoL_diff) * diffuse_weight

        # specular branch
        rd_spec_basis = sample_visible_trowbridge_reitz(v_basis, alpha, samp)
        rd_spec = jnp.einsum("...ji,...j->...i", basis, rd_spec_basis)
        NoL_spec = saturate(_dot(surface["normal_ws"], rd_spec))
        h = surface["inv_view_ray"] + rd_spec
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)
        NoH = saturate(_dot(surface["normal_ws"], h))
        VoH = saturate(_dot(surface["inv_view_ray"], h))
        f0 = fresnel_zero(surface["albedo"], surface["metallic"])
        brdf_spec = cook_torrance_brdf(
            NoL_spec, surface["NoV"], NoH, VoH, f0, surface["roughness"]
        )
        pdf_spec = (
            visible_trowbridge_reitz_pdf(v_basis, rd_spec_basis, alpha)
            * specular_weight
        )

        rd = jnp.where(pick_diffuse[..., None], rd_diff, rd_spec)
        brdf = jnp.where(pick_diffuse[..., None], brdf_diff, brdf_spec)
        NoL = jnp.where(pick_diffuse, NoL_diff, NoL_spec)
        pdf = jnp.where(pick_diffuse, pdf_diff, pdf_spec)
        w_raw = brdf * (NoL / pdf)[..., None]
        # GLSL max(brdf*NoL/pdf, 0): max with NaN yields the non-NaN
        # operand on GPUs, so NaN/inf-pdf samples become 0 — emulate that
        # (jnp.maximum would propagate the NaN instead).
        w = jnp.where((w_raw >= 0.0) & jnp.isfinite(w_raw), w_raw, 0.0)
        throughput = jnp.where(
            hit_valid[..., None], throughput * w, throughput
        )

        # ---- Russian roulette (main.rgen:270-276) ----
        # The GLSL advances the RNG only when bounce > rouletteStartBounce;
        # that condition is uniform per bounce, so a masked state advance
        # keeps stream parity.
        rr_on = bounce > ROULETTE_START_BOUNCE
        state_rr, rr = prng.rnd01(state)
        state = jnp.where(rr_on, state_rr, state)
        kill = rr_on & (rr < jnp.maximum(0.05, 1.0 - throughput.max(axis=-1)))
        active = active & ~kill

        active = active & hit_valid
        # Dead rays keep their previous finite origin/direction (tight
        # packet bounds) and are disabled via t_max = 0.
        ray_o = jnp.where(
            active[..., None],
            offset_ray(surface["position_ws"], surface["normal_ws"]),
            ray_o,
        )
        ray_d = jnp.where(active[..., None], rd, ray_d)
        return state, color, throughput, active, ray_o, ray_d, need_shadow

    # ---- dense primary trace over all pixels ----
    lane_real = (
        jnp.arange(R, dtype=jnp.int32) < R0
        if pad
        else jnp.ones((R,), bool)
    )
    tmax0 = jnp.where(lane_real, jnp.inf, 0.0)
    n_rays = jnp.sum(lane_real.astype(jnp.int32))
    raygen = (
        pix_packed is not None
        and use_full_kernel
        and bvh is not None
        and not use_dof
    )
    # Full-frame RNG/ray streams materialize ONLY when something consumes
    # every row (the XLA/prepacked trace, env miss shading, the alpha
    # retrace); the chunk loop recomputes its slice via primary_streams.
    need_full = (not raygen) or (env is not None) or bool(alpha_rounds)
    state = ray_o = ray_d = None
    if need_full:
        state, ray_o, ray_d = primary_streams(px, py)

    from ..ops.trace_bvh import pack_hit16, unpack_hit16

    h16_rows = None
    hit0 = None
    # named pass scope: per-pass device attribution via
    # utils/profiler.profile_passes (Profiler.hpp:19-327 analog)
    primary_scope = jax.named_scope("primary_trace")
    primary_scope.__enter__()
    if raygen:
        # in-kernel primary raygen: jittered pinhole rays are generated
        # inside the trace kernel from static pixel layouts + camera
        # uniforms (bit-parity pcg3d jitter), so the 2M-ray cols/rowdata
        # prep and its relayout copies never run. Shading chunks
        # recompute the matching RNG stream from px/py — same rays.
        from ..ops.trace_bvh import (
            primary_cam_vec,
            primary_tile_mask,
            trace_primary_bvh_full,
        )

        cam_vec = primary_cam_vec(cam, width, height)
        # per-ray-tile liveness vs every cluster AABB: dead tiles (~90 %
        # on a sparse-coverage frame) skip raygen/descent in-kernel
        tmask = (
            primary_tile_mask(cam_vec, pix_packed[2], wc_min, wc_max)
            if len(pix_packed) > 2 and pix_packed[2] is not None
            else None
        )
        h16 = trace_primary_bvh_full(
            packed_full,
            bvh[0],
            bvh[1],
            pix_packed[0],
            pix_packed[1],
            cam_vec,
            jnp.full((1, 4), frame_index, jnp.int32),
            tile_mask=tmask,
        )
        h16_rows = h16[:R]
        if alpha_rounds:
            hit0 = trace_with_alpha(
                state, ray_o, ray_d, tmax0, compact=True,
                hit=unpack_hit16(h16_rows),
            )
            h16_rows = pack_hit16(hit0)
        hit_tri = h16_rows[:, 1]
    else:
        hit0 = trace_with_alpha(state, ray_o, ray_d, tmax0, compact=True)
        if use_full_kernel:
            # chunks gather ONE packed (R, 16) array instead of seven
            # per-field tile views (each a full relayout copy)
            h16_rows = pack_hit16(hit0)
        hit_tri = hit0["tri"].astype(jnp.float32)
    primary_scope.__exit__(None, None, None)

    color_full = jnp.zeros((R, 3), jnp.float32)
    if env is not None:
        from ..ops.ibl import sample_cubemap

        missed = lane_real & (hit_tri < 0)
        color_full = jnp.where(
            missed[..., None], sample_cubemap(env, ray_d), 0.0
        )

    # ---- tile compaction: keep 256-ray tiles containing any hit ----
    hit_lane = (hit_tri >= 0) & lane_real
    tile_any = jnp.any(hit_lane.reshape(n_tiles, TILE), axis=1)
    # Pad tidx to a CT multiple so the chunk dynamic_slice never clamps
    # (a clamped start re-reads earlier tiles and the color_full scatter
    # would accumulate their radiance twice on near-full-coverage frames).
    tidx_size = ((n_tiles + CT - 1) // CT) * CT
    tidx = jnp.nonzero(tile_any, size=tidx_size, fill_value=n_tiles)[
        0
    ].astype(jnp.int32)
    tcount = jnp.sum(tile_any.astype(jnp.int32))
    n_chunks = (tcount + CT - 1) // CT

    # Loop-invariant tiled views hoisted OUT of the chunk body, and the
    # color accumulator carried in tile-row shape: reshapes at a fori_loop
    # carry boundary materialize as full relayout copies EVERY iteration
    # (the 3.2 ms slice/copy ops that dominated the PT xplane's glue),
    # while the same reshapes outside the loop fuse for free.
    def _tile_view(a):
        k = 1
        for s in a.shape[1:]:
            k *= s
        return a.reshape(n_tiles, TILE * k)

    px_t = px.reshape(n_tiles, TILE)
    py_t = py.reshape(n_tiles, TILE)
    if h16_rows is not None:
        h16_t = h16_rows.reshape(n_tiles, TILE * 16)
    else:
        hit0_t = {k: _tile_view(v) for k, v in hit0.items()}

    def tgather_t(at, like, slc):
        return at[slc].reshape((CT * TILE,) + like.shape[1:])

    def chunk_body(ci, carry):
        color_full, n_rays = carry
        sl = jax.lax.dynamic_slice(tidx, (ci * CT,), (CT,))
        tile_ok = sl < n_tiles
        slc = jnp.minimum(sl, n_tiles - 1)
        lane_ok = jnp.repeat(tile_ok, TILE)

        # recompute this chunk's RNG/ray streams from px/py (two u32
        # channels) instead of gathering nine channels of tile views —
        # bit-identical, primary_streams is pure per-pixel math
        c_state, c_o, c_d = primary_streams(
            tgather_t(px_t, px, slc), tgather_t(py_t, py, slc)
        )
        if h16_rows is not None:
            c_hit = unpack_hit16(h16_t[slc].reshape(CT * TILE, 16))
        else:
            c_hit = {
                k: tgather_t(hit0_t[k], v, slc) for k, v in hit0.items()
            }
        # lane reality is positional (global ray index < R0), so it is
        # derived from the tile ids — no gather
        c_lanes = (
            slc[:, None] * TILE
            + jnp.arange(TILE, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        c_active = (c_hit["tri"] >= 0) & lane_ok & (c_lanes < R0)
        c_color = jnp.zeros((CT * TILE, 3), jnp.float32)
        c_thr = jnp.ones((CT * TILE, 3), jnp.float32)
        n_extra = jnp.int32(0)

        def bounce_round(b, s, col, thr, act, o_, d_, hit_):
            """One bounce's shade + trace over ANY lane set (used by the
            inner per-bounce re-compaction below). `b` is a PYTHON int
            (the bounce loop is unrolled — max_bounces is static), so the
            trace-or-not decision and the last round's miss are static:
            no lax.cond staging, and bounce max_bounces-1 traces nothing.
            """
            (s, col, thr, act, o_, d_, need_shadow) = shade_and_bounce(
                b, s, col, thr, act, o_, d_, hit_
            )
            tmax_ = jnp.where(act, jnp.inf, 0.0)
            more = b + 1 < max_bounces
            if not (more and PT_DEBUG_BOUNCE):
                hit2 = miss_hit_like(hit_, tmax_)
            elif leafmajor:
                hit2 = bounce_tr["closest_full"](o_, d_, 1e-4, tmax_)
                if alpha_rounds:
                    hit2 = alpha_retrace(s, o_, d_, tmax_, hit2)
            elif sort_rays:
                # bounce rays leave the surface their parent hit: sort by
                # (that cluster, direction octant) for packet coherence
                b_cluster = jnp.maximum(hit_["tri"], 0) // trace.CLUSTER_PAD
                perm, inv = _sorted(_sort_key(b_cluster, d_, act))
                if bounce_deferred_attrs:
                    from ..ops.trace_bvh import (
                        attrs_from_hit_rows,
                        trace_closest_bvh,
                        unpack_hit8,
                    )

                    h8 = trace_closest_bvh(
                        packed_full, bvh[0], bvh[1], o_, d_, 0.0, tmax_,
                        perm=perm, tile=bounce_tile, packed=True,
                    )
                    hit2 = attrs_from_hit_rows(
                        attr_rows, unpack_hit8(h8[inv])
                    )
                    if alpha_rounds:
                        hit2 = alpha_retrace(s, o_, d_, tmax_, hit2)
                else:
                    hit2 = trace_with_alpha(
                        s, o_, d_, tmax_, perm=perm, inv=inv,
                        tile=bounce_tile,
                    )
            else:
                hit2 = trace_with_alpha(s, o_, d_, tmax_)
            if env is not None and more:
                from ..ops.ibl import sample_cubemap

                b_miss = act & (hit2["tri"] < 0)
                sky = thr * sample_cubemap(env, d_)
                sky_contrib = jnp.where(b_miss[..., None], sky, 0.0)
                if clamp_indirect:
                    # every in-chunk trace is bounce >= 1
                    sky_contrib = jnp.clip(sky_contrib, 0.0, 2.0)
                col = col + sky_contrib
            return s, col, thr, act, o_, d_, hit2, need_shadow

        def bounce_body(b, bc):
            (c_state, c_color, c_thr, c_active, c_o, c_d, c_hit,
             n_extra) = bc
            # per-bounce RE-compaction: the chunk's live set shrinks each
            # bounce (hits+RR), so later rounds shade/trace only tiles
            # that still carry active rays. Lanes in skipped tiles keep
            # their previous state — which is exactly the dense result,
            # since every update in bounce_round is masked by `act`
            # (dead lanes' RNG streams differ but are never observed).
            from ..ops.compact import tile_apply

            def _inner(c_in, lane_ok):
                s, col, thr, act, o_, d_, hit_ = c_in
                act = act & lane_ok
                (s, col, thr, act, o_, d_, hit2, need_shadow) = (
                    bounce_round(b, s, col, thr, act, o_, d_, hit_)
                )
                return {
                    "state": s, "color": col, "thr": thr, "active": act,
                    "o": o_, "d": d_, "hit": hit2,
                    "need_shadow": need_shadow,
                }

            if PT_INNER_COMPACT:
                out = tile_apply(
                    c_active, _inner,
                    (c_state, c_color, c_thr, c_active, c_o, c_d, c_hit),
                    chunk_tiles=128,
                )
            else:
                out = _inner(
                    (c_state, c_color, c_thr, c_active, c_o, c_d, c_hit),
                    jnp.ones_like(c_active),
                )

            def mrg(new, old):
                m = c_active.reshape(
                    c_active.shape + (1,) * (old.ndim - 1)
                )
                return jnp.where(m, new, old)

            c_state = mrg(out["state"], c_state)
            c_color = mrg(out["color"], c_color)
            c_thr = mrg(out["thr"], c_thr)
            new_active = out["active"] & c_active
            c_o = mrg(out["o"], c_o)
            c_d = mrg(out["d"], c_d)
            c_hit = {k: mrg(out["hit"][k], c_hit[k]) for k in c_hit}
            more = b + 1 < max_bounces
            n_extra = n_extra + jnp.sum(
                (out["need_shadow"] & c_active).astype(jnp.int32)
            )
            if more:
                n_extra = n_extra + jnp.sum(new_active.astype(jnp.int32))
            return (c_state, c_color, c_thr, new_active, c_o, c_d, c_hit,
                    n_extra)

        # UNROLLED bounce loop (max_bounces is static): a lax.fori_loop
        # here materializes its ~17 MB carry tuple (state/o/d/thr/16-ch
        # hit) at every iteration boundary and forces a lax.cond around
        # the trace; unrolled, XLA fuses across bounces and the last
        # round's trace disappears statically.
        bc = (c_state, c_color, c_thr, c_active, c_o, c_d, c_hit, n_extra)
        for b in range(max_bounces):
            bc = bounce_body(b, bc)
        c_color, n_extra = bc[1], bc[7]

        c_color = jnp.where(lane_ok[..., None], c_color, 0.0)
        color_full = color_full.at[slc].add(c_color.reshape(CT, TILE * 3))
        return color_full, n_rays + n_extra

    with jax.named_scope("wavefront"):
        color_full, n_rays = jax.lax.fori_loop(
            0, n_chunks, chunk_body,
            (color_full.reshape(n_tiles, TILE * 3), n_rays),
        )
    return color_full.reshape(R, 3)[:R0], n_rays


@partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "max_bounces",
        "use_dof",
        "clamp_indirect",
        "return_stats",
        "alpha_rounds",
    ),
)
def pt_render_sample(
    static_scene: dict,
    frame: dict,
    arena: dict,
    cam: dict,
    width: int,
    height: int,
    frame_index,
    max_bounces: int = 3,
    use_dof: bool = False,
    clamp_indirect: bool = False,
    return_stats: bool = False,
    env: jnp.ndarray | None = None,
    alpha_rounds: int = 0,
):
    """One full-frame 1-spp sample pass -> (H*W, 3) linear color in
    row-major pixel order (+ ray count when return_stats).

    Pixels are traced in 16x16-block order for tight ray packets, then
    scattered back to row-major."""
    px_np, py_np, _inv_np = trace.block_pixel_order(width, height)
    px = jnp.asarray(px_np)
    py = jnp.asarray(py_np)
    cols_np, rows_np, tpb_np, _r0 = _packed_pixels(width, height)
    color, n_rays = pt_trace_pixels(
        static_scene,
        frame,
        arena,
        cam,
        px,
        py,
        jnp.array([width, height], jnp.int32),
        frame_index,
        max_bounces,
        use_dof,
        clamp_indirect,
        env,
        alpha_rounds,
        pix_packed=(
            jnp.asarray(cols_np),
            jnp.asarray(rows_np),
            jnp.asarray(tpb_np),
        ),
    )
    # segment-level inverse permutation: 16x fewer gather rows than a
    # per-pixel color[inv]
    color = trace.permute16(
        color, jnp.asarray(trace.block_inverse16(width, height))
    )
    if return_stats:
        return color, n_rays
    return color


def pt_accumulate(prev_color, prev_count, sample):
    """Running-mean accumulation (main.rgen:284-297)."""
    count = prev_count + 1.0
    new_color = prev_color + (sample - prev_color) / count[..., None]
    return new_color, count


@partial(jax.jit, static_argnames=("width", "height"))
def _accum_tonemap(prev_color, prev_count, sample_flat, lut, exposure,
                   contrast, *, width, height):
    """Jitted frame tail: accumulate + tonemap in ONE dispatch.

    Eager per-frame tails cost ~50 host dispatches/frame through the
    tunnel (xprof r4: restir device 155 ms vs 318 ms wall — the gap was
    almost entirely eager jit_multiply/jit_gather/... modules), and the
    eager chain serialized frame i+1's dispatch behind frame i's tail.
    The sample render takes no state, so with the tail fused the next
    frame's render overlaps this frame's accumulation."""
    with jax.named_scope("accumulate"):
        sample = sample_flat.reshape(height, width, 3)
        color, count = pt_accumulate(prev_color, prev_count, sample)
    with jax.named_scope("tonemap"):
        img = tone_map(color, lut, exposure, contrast)
    return img, color, count


def pt_entry(
    *,
    static,
    frame,
    arena,
    cam,
    lut,
    width,
    height,
    exposure=1.0,
    contrast=1.0,
    max_bounces=3,
    frame_index=0,
    state=None,
    accumulate=True,
    env=None,
    alpha_rounds=0,
    **_,
):
    """CLI-facing PT mode: renders one sample, accumulates, tonemaps."""
    from ..utils.profiler import profiled_jit_call

    sample = profiled_jit_call(
        pt_render_sample,
        static, frame, arena, cam, width, height, frame_index, max_bounces,
        env=env, alpha_rounds=alpha_rounds,
    )
    if state is None or not accumulate:
        img, color, count = profiled_jit_call(
            _accum_tonemap,
            jnp.zeros((height, width, 3), jnp.float32),
            jnp.zeros((height, width), jnp.float32),
            sample, lut, exposure, contrast, width=width, height=height,
        )
    else:
        img, color, count = profiled_jit_call(
            _accum_tonemap,
            state[0], state[1], sample, lut, exposure, contrast,
            width=width, height=height,
        )
    return img, (color, count)
