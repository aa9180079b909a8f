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

TPU-first structure: all pixels advance in lockstep with an active mask
(no divergence), bounded static bounce count; rays/hits stay in flat
(R, ...) SoA arrays resident in HBM.
"""

from __future__ import annotations

from functools import partial

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


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


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
    wavefront_sort: bool = False,
):
    """Path-trace an arbitrary flat pixel list -> ((R,3) color, ray count).

    alpha_rounds > 0 enables stochastic-alpha any-hit parity
    (scene.rahit): ignored hits (failed mask test, or blend alpha below a
    per-ray uniform) re-trace from just past the hit, up to alpha_rounds
    times. The per-ray uniform is fixed per traceRay like the reference's
    payload.randomSeed (scene.rahit:33-38).

    Taking explicit pixel coordinates makes the kernel shardable: each
    device of a mesh traces its own pixel slice (render/distributed.py),
    the multi-chip strategy standing in for the reference's single-GPU
    viewport (SURVEY.md §5 "sharding axes: pixels/tiles/rays").
    """
    R = px.shape[0]
    width, height = resolution[0], resolution[1]
    state = prng.make_state(px, py, jnp.uint32(frame_index))

    state, jitter = prng.rnd2d01(state)
    uv = (
        jnp.stack([px, py], axis=-1).astype(jnp.float32) + jitter
    ) / jnp.stack([width, height]).astype(jnp.float32)

    if use_dof:
        state, lens = prng.rnd2d01(state)
        ray_o, ray_d = thin_lens_rays(cam, uv, lens)
    else:
        ray_o, ray_d = pinhole_rays(cam, uv)

    tris = trace.world_triangles(static_scene, frame)
    wc_min = frame["wc_aabb_min_w"]
    wc_max = frame["wc_aabb_max_w"]
    bvh = trace.frame_bvh(frame)
    trace_closest_fn, trace_any_fn = trace.make_tracer(
        tris, wc_min, wc_max, bvh=bvh
    )
    use_full_kernel = jax.default_backend() != "cpu"
    if use_full_kernel:
        # fused hit+attribute kernel: surface attributes come out of the
        # traversal's VMEM registers instead of post-pass XLA gathers
        from functools import partial as _partial

        from ..ops.trace_pallas_full import pack_tris_full, trace_closest_full

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

    color = jnp.zeros((R, 3), jnp.float32)
    throughput = jnp.ones((R, 3), jnp.float32)
    active = jnp.ones((R,), bool)

    # One bounce body compiled once and iterated (static trip count):
    # keeps XLA compile time flat in max_bounces.
    n_clusters = wc_min.shape[0]

    def bounce_body(bounce, carry):
        state, color, throughput, active, ray_o, ray_d, ray_tmax, n_rays, origin_cluster = carry
        n_rays = n_rays + jnp.sum(active.astype(jnp.int32))

        if wavefront_sort:
            # Round-1 wavefront coherence sort: group bounce rays by
            # (origin cluster, direction octant). With the in-kernel BVH
            # descent's per-ray node tests this usually LOSES: the
            # argsort + permutation gathers cost ~2x what they save
            # (bounce origins from one 16x16 pixel block stay spatially
            # local, so packets remain workable unsorted). Kept behind a
            # flag for flat-kernel runs and perf comparisons.
            ad = jnp.abs(ray_d)
            denom = jnp.maximum(ad[:, 0] + ad[:, 1] + ad[:, 2], 1e-20)
            ox_ = ray_d[:, 0] / denom
            oy_ = ray_d[:, 1] / denom
            # fold lower hemisphere (signed octahedral)
            fold = ray_d[:, 2] < 0.0
            ox2 = jnp.where(fold, (1.0 - jnp.abs(oy_)) * jnp.sign(ox_), ox_)
            oy2 = jnp.where(fold, (1.0 - jnp.abs(ox_)) * jnp.sign(oy_), oy_)
            bx = jnp.clip(((ox2 * 0.5 + 0.5) * 8).astype(jnp.int32), 0, 7)
            by = jnp.clip(((oy2 * 0.5 + 0.5) * 8).astype(jnp.int32), 0, 7)
            octant = (
                (bx * 8 + by) * 2 + fold.astype(jnp.int32)
            )  # 128 direction bins
            key = jnp.where(
                active, origin_cluster * 128 + octant, 128 * n_clusters + 1
            )
            key = jnp.where(
                bounce > 0, key, jnp.arange(key.shape[0], dtype=jnp.int32)
            )
            perm = jnp.argsort(key, stable=True)
            # scatter inverse: cheaper than a second argsort
            inv_perm = (
                jnp.zeros_like(perm)
                .at[perm]
                .set(jnp.arange(perm.shape[0], dtype=perm.dtype))
            )
            o_p, d_p, tmax_p = ray_o[perm], ray_d[perm], ray_tmax[perm]
        else:
            perm = inv_perm = None
            o_p, d_p, tmax_p = ray_o, ray_d, ray_tmax
        hit = trace_closest_fn(o_p, d_p, 0.0, tmax_p)
        if alpha_rounds and use_full_kernel:
            from ..ops.texture import sample_alpha_packed

            # fixed per-ray uniform: pcg(state.x ^ state.z) (no advance),
            # the payload.randomSeed convention
            seed = prng.pcg(state[..., 0] ^ state[..., 2])
            if perm is not None:
                seed = seed[perm]
            au = prng.rng_to01(seed)
            t_off = jnp.zeros_like(hit["t"])
            o_cur = o_p
            tmax_cur = tmax_p
            for _ in range(alpha_rounds):
                a = sample_alpha_packed(arena, hit["material"], hit["uv"])
                ignore = (hit["tri"] >= 0) & (
                    (a == 0.0) | ((a > 0.0) & (au > a))
                )
                adv = jnp.where(ignore, hit["t"] * (1.0 + 1e-4) + 1e-5, 0.0)
                o_cur = o_cur + d_p * adv[..., None]
                tmax_cur = jnp.where(
                    ignore, jnp.maximum(tmax_cur - adv, 0.0), 0.0
                )
                t_off = t_off + adv
                hit2 = trace_closest_fn(o_cur, d_p, 0.0, tmax_cur)
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
            hit["t"] = hit["t"] + t_off
        if inv_perm is not None:
            hit = {k: v[inv_perm] for k, v in hit.items()}
        hit_valid = (hit["tri"] >= 0) & active
        # IBL skybox on miss (main.rgen:246-254)
        if env is not None:
            from ..ops.ibl import sample_cubemap

            missed = active & (hit["tri"] < 0)
            sky = throughput * sample_cubemap(env, ray_d)
            sky_contrib = jnp.where(missed[..., None], sky, 0.0)
            if clamp_indirect:
                sky_contrib = jnp.where(
                    bounce > 0, jnp.clip(sky_contrib, 0.0, 2.0), sky_contrib
                )
            color = color + sky_contrib
        if use_full_kernel:
            from .surface import evaluate_surface_from_attrs

            surface = evaluate_surface_from_attrs(arena, ray_o, ray_d, hit)
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
        l, dist, irradiance = sample_light(lights, light_index, surface["position_ws"])
        front = _dot(l, surface["normal_ws"]) > 0.0
        need_shadow = hit_valid & front & (surface["alpha"] != 0.0)
        # Rays that don't need a shadow keep a finite origin/direction
        # (miss rays have inf positions that would poison packet bounds)
        # and are disabled via t_max = 0, which keeps the conservative
        # cull tight instead of degenerating to all-clusters.
        shadow_o = jnp.where(need_shadow[..., None], surface["position_ws"], ray_o)
        shadow_d = jnp.where(need_shadow[..., None], l, ray_d)
        shadow_tmax = jnp.where(need_shadow, dist, 0.0)
        if perm is not None:
            occluded = trace_any_fn(
                shadow_o[perm], shadow_d[perm], 0.1, shadow_tmax[perm]
            )[inv_perm]
        else:
            occluded = trace_any_fn(shadow_o, shadow_d, 0.1, shadow_tmax)
        n_rays = n_rays + jnp.sum(need_shadow.astype(jnp.int32))
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
            contrib = jnp.where(bounce > 0, jnp.clip(contrib, 0.0, 2.0), contrib)
        color = color + contrib

        # ---- bounce importance sampling (main.rgen:92-144) ----
        state, pick_u = prng.rnd01(state)
        state, samp = prng.rnd2d01(state)

        specular_only = surface["metallic"] > 0.999
        specular_weight = jnp.where(specular_only, 1.0, 0.5)
        diffuse_weight = 1.0 - specular_weight
        pick_diffuse = pick_u < diffuse_weight

        basis = orthonormal_basis(surface["normal_ws"])  # (R, 3, 3)
        v_basis = jnp.einsum("...ij,...j->...i", basis, surface["inv_view_ray"])
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
        throughput = jnp.where(hit_valid[..., None], throughput * w, throughput)

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
        ray_tmax = jnp.where(active, jnp.inf, 0.0)
        origin_cluster = jnp.maximum(hit["tri"], 0) // trace.CLUSTER_PAD
        return (
            state,
            color,
            throughput,
            active,
            ray_o,
            ray_d,
            ray_tmax,
            n_rays,
            origin_cluster,
        )

    carry = (
        state,
        color,
        throughput,
        active,
        ray_o,
        ray_d,
        jnp.full((R,), jnp.inf, jnp.float32),
        jnp.int32(0),
        jnp.zeros((R,), jnp.int32),
    )
    carry = jax.lax.fori_loop(0, max_bounces, bounce_body, carry, unroll=1)
    return carry[1], carry[7]


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
        "wavefront_sort",
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
    wavefront_sort: bool = False,
):
    """One full-frame 1-spp sample pass -> (H*W, 3) linear color in
    row-major pixel order (+ ray count when return_stats).

    Pixels are traced in 16x16-block order for tight ray packets, then
    scattered back to row-major."""
    px_np, py_np, inv_np = trace.block_pixel_order(width, height)
    px = jnp.asarray(px_np)
    py = jnp.asarray(py_np)
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
        wavefront_sort,
    )
    color = color[jnp.asarray(inv_np)]
    if return_stats:
        return color, n_rays
    return color


def pt_accumulate(prev_color, prev_count, sample):
    """Running-mean accumulation (main.rgen:284-297)."""
    count = prev_count + 1.0
    new_color = prev_color + (sample - prev_color) / count[..., None]
    return new_color, count


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
    sample = pt_render_sample(
        static, frame, arena, cam, width, height, frame_index, max_bounces,
        env=env, alpha_rounds=alpha_rounds,
    ).reshape(height, width, 3)
    if state is None or not accumulate:
        color, count = sample, jnp.ones((height, width), jnp.float32)
    else:
        color, count = pt_accumulate(state[0], state[1], sample)
    img = tone_map(color, lut, exposure, contrast)
    return img, (color, count)
