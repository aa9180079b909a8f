"""ReSTIR DI statistical correctness: RIS with UCW must be unbiased vs
brute-force direct lighting on a many-light scene."""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.mathx.color import luminance as _lum
from prosper_tpu.render.restir import initial_reservoirs, _p_hat
from prosper_tpu.render.shading import sample_light
from prosper_tpu.ops.brdf import eval_brdf_times_nol
from prosper_tpu.scene.lights import LightArrays, light_uniforms


def _many_light_setup(n_lights=32, n_px=512, seed=0):
    rng = np.random.default_rng(seed)
    la = LightArrays()
    la.dir_irradiance = np.zeros(3, np.float32)  # isolate point lights
    la.point_position[:n_lights] = rng.uniform(-5, 5, (n_lights, 3)).astype(
        np.float32
    )
    la.point_position[:n_lights, 1] = rng.uniform(1, 4, n_lights)
    la.point_radiance[:n_lights] = rng.uniform(0.5, 4.0, (n_lights, 3))
    la.point_radius[:n_lights] = 30.0
    la.point_count = n_lights
    lights = {k: jnp.asarray(v) for k, v in light_uniforms(la).items()}

    pos = rng.uniform(-4, 4, (n_px, 3)).astype(np.float32)
    pos[:, 1] = 0.0
    normal = np.tile(np.array([[0, 1.0, 0]], np.float32), (n_px, 1))
    view = rng.normal(size=(n_px, 3)).astype(np.float32)
    view[:, 1] = np.abs(view[:, 1]) + 0.5
    view /= np.linalg.norm(view, axis=1, keepdims=True)
    surface = {
        "position_ws": jnp.asarray(pos),
        "normal_ws": jnp.asarray(normal),
        "inv_view_ray": jnp.asarray(view),
        "albedo": jnp.full((n_px, 3), 0.6, jnp.float32),
        "roughness": jnp.full((n_px,), 0.5, jnp.float32),
        "metallic": jnp.zeros((n_px,), jnp.float32),
        "NoV": jnp.clip(jnp.sum(normal * view, -1), 0, 1),
    }
    return surface, lights


def _reference_direct(surface, lights, n_lights):
    """Sum over all lights of irradiance * BRDF*NoL (no shadows)."""
    total = jnp.zeros_like(surface["position_ws"])
    for i in range(1, n_lights + 1):  # light 0 is the (zeroed) sun
        li = jnp.full(surface["position_ws"].shape[:-1], i, jnp.int32)
        l, _, irr = sample_light(lights, li, surface["position_ws"])
        total = total + irr * eval_brdf_times_nol(
            l,
            surface["inv_view_ray"],
            surface["normal_ws"],
            surface["albedo"],
            surface["roughness"],
            surface["metallic"],
        )
    # + sun (index 0), zero here
    return total


def test_initial_reservoirs_unbiased():
    n_lights, n_px = 32, 512
    surface, lights = _many_light_setup(n_lights, n_px)
    px = jnp.arange(n_px, dtype=jnp.uint32)
    py = jnp.zeros(n_px, jnp.uint32)

    # Monte Carlo estimate: E[pHat-shaded sample * UCW] over many frames.
    # Estimator contribution for the scalar pHat is f(light)*UCW where
    # f = pHat, so E = sum_l pHat(l) exactly when unbiased.
    n_frames = 300
    acc = np.zeros(n_px, np.float64)
    for f in range(n_frames):
        li, ucw = initial_reservoirs(surface, lights, px, py, f)
        ph = _p_hat(surface, lights, jnp.maximum(li, 0))
        est = np.asarray(jnp.where(li >= 0, ph * ucw, 0.0))
        acc += est
    got = acc / n_frames

    want = np.asarray(
        _lum(_reference_direct(surface, lights, n_lights))
    )
    # aggregate bias over all pixels should vanish; per-pixel noise ~1/sqrt(300)
    sel = want > 1e-4
    rel = got[sel].mean() / want[sel].mean()
    assert abs(rel - 1.0) < 0.05, rel


def test_reservoir_picks_valid_lights():
    n_lights, n_px = 8, 256
    surface, lights = _many_light_setup(n_lights, n_px, seed=3)
    px = jnp.arange(n_px, dtype=jnp.uint32)
    py = jnp.ones(n_px, jnp.uint32)
    li, ucw = initial_reservoirs(surface, lights, px, py, 0)
    li = np.asarray(li)
    ucw = np.asarray(ucw)
    # nearly all pixels should land a positive-pHat light (the zeroed sun
    # can win only if all 5 candidates picked it)
    assert (li >= 0).mean() > 0.95
    assert (li <= n_lights).all()
    assert (ucw[li >= 0] >= 0).all()
