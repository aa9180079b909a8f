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
    # (all-rays x all-clusters cull + argmin pops). Measured on v5e
    # (scripts/bench_dense.py, round 4, 70k-ray shadow batch): dense
    # 7.56 ms vs stack 8.85 ms, but dense is O(C) per packet — the
    # frame-level A/B decides the default (VERDICT r4 next #2).
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
    # texture()). Base-mip taps gather-randomly into the full ~700 MB
    # quad arena (~46 ns/row HBM latency — ~13 ms/frame of the 1080p PT
    # xplane, round 5); mip 4 shrinks the working set 256x, and bounce
    # radiance is hemisphere-averaged so a coarse footprint is the more
    # physically reasonable filter anyway. Primary-surface taps are
    # unaffected (pixel parity).
    bounce_tap_mip: int = 4

    # Rays/packet for the ReSTIR 1024-light shadow batch. Unlike the PT
    # NEE set (one directional light -> coherent packets, 256 best), a
    # light-sorted 256-ray packet here spans ~2-4 DIFFERENT scattered
    # lights (131k rays / 1024 lights ~ 128 rays/light), so packet
    # union-visit waste is the bound (xprof r4: 64 ms / 512 packets ~
    # 48 union leaf visits/packet). 128 vs 256 A/B: see ROADMAP r5.
    restir_shadow_tile: int = 256


policy = KernelPolicy()
