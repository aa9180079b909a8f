"""Single runtime-policy surface for selectable kernel variants.

Every switchable kernel policy lives HERE and is surfaced as a CLI/TOML
flag by app/cli.py — never as an environment variable. This matches the
reference's single configuration surface (main.cpp parseCli,
/root/reference/src/main.cpp:46-130): one place where a user flips a
behavior, with the measured default written next to the knob.

Scripts and tests may set fields directly (`config.policy.any_tracer =
"dense"`), but because the render entry points are jitted with these
values read at TRACE time, flipping a field after a function has been
traced requires `jax.clear_caches()` (the established A/B-script
convention) — the CLI sets policy before the first trace, so normal
runs never retrace.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class KernelPolicy:
    # Any-hit (shadow) BVH descent in ops/trace.make_tracer when node
    # arrays are present: "stack" (ordered BVH2 walk) or "dense"
    # (all-rays x all-clusters cull + argmin pops). In-situ, dense won
    # the isolated 70k-ray shadow batch 7.56 vs 8.85 ms (round 4); at
    # FRAME level it loses — PT 3-bounce frame 191.8 ms (dense) vs
    # 173.9 ms (stack), same session, scripts/bench_ab_r5.py round 5 —
    # the O(C)-per-packet cull swamps the per-visit win across the
    # frame's coherent-directional NEE batches. Stack is the measured
    # default.
    any_tracer: str = "stack"

    # Incoherent (bounce/shadow) ray tracer preference consumed by
    # ops/trace.make_bounce_tracer — the ONE leaf-major/packet decision
    # point. Packet is the measured winner at production scale
    # (scripts/bench_leafmajor.py, v5e round 4: bounce-closest 36.5 ms
    # packet vs 514 ms leaf-major; shadow-any 7.6 vs 502 ms — the dense
    # O(rays x clusters) pair enumeration swamps the fast pair-block
    # Möller stage).
    bounce_tracer: str = "packet"

    # Texture mip for SECONDARY-bounce surface taps in the PT wavefront
    # (0 = base-mip parity with the reference's derivative-free
    # texture()). MEASURED NO-WIN on v5e (scripts/bench_ab_r5.py,
    # round 5): mip 4 shrinks the gather working set 256x but the frame
    # was 173.9 ms vs 170.7 base-mip, same session — the ~13 ms of quad-
    # arena gathers in the PT xplane are bound by per-row gather issue
    # latency, not DRAM locality, so a smaller footprint buys nothing.
    # Default stays 0 (exact reference parity); the knob remains for
    # texture sets large enough to page.
    bounce_tap_mip: int = 0

    # Rays/packet for the ReSTIR 1024-light shadow batch. Unlike the PT
    # NEE set (one directional light -> coherent packets, 256 best), a
    # light-sorted 256-ray packet here spans ~2-4 DIFFERENT scattered
    # lights (131k rays / 1024 lights ~ 128 rays/light), so packet
    # union-visit waste is the bound (xprof r4: 64 ms / 512 packets ~
    # 48 union leaf visits/packet). Frame-level A/B
    # (scripts/bench_ab_r5.py, round 5): 128 measured 143.3 vs 145.6 ms
    # at 256 — within session noise, so packet size is NOT the lever
    # here; 256 stays (knob closed with data).
    restir_shadow_tile: int = 256


policy = KernelPolicy()
