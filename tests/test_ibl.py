"""IBL: cubemap addressing roundtrip, split-sum LUT properties,
irradiance/prefilter energy sanity, evalIBL parity shape."""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.ops import ibl


def test_cubemap_roundtrip():
    """Sampling along each texel's own direction returns that texel."""
    S = 16
    dirs = ibl.face_directions(S)
    rng = np.random.default_rng(0)
    cube = jnp.asarray(rng.random((6, S, S, 3), dtype=np.float32))
    got = ibl.sample_cubemap(cube, dirs)
    # interior texels are exact (bilinear at centers); edges blend
    err = np.abs(np.asarray(got) - np.asarray(cube))[:, 2:-2, 2:-2]
    assert err.max() < 1e-5, err.max()


def test_specular_brdf_lut():
    lut = np.asarray(ibl.integrate_specular_brdf(res=64, n_samples=128))
    assert lut.shape == (64, 64, 2)
    assert (lut >= 0).all() and (lut <= 1).all()
    # at low roughness / high NoV, A -> ~1 and B -> small
    assert lut[1, -1, 0] > 0.9
    assert lut[1, -1, 1] < 0.1


def test_irradiance_of_uniform_env_is_uniform():
    env = jnp.ones((6, 32, 32, 3)) * 2.0
    irr = np.asarray(ibl.sample_irradiance(env, out_res=8))
    # cosine-convolved uniform radiance L: E = pi * L ... normalized by
    # the quadrature the reference uses; just assert uniformity + positive
    assert irr.std() / irr.mean() < 0.02
    assert irr.mean() > 0


def test_prefilter_mip0_matches_env_roughly():
    # sun-free sky: the prefilter clamps samples at 10 (reference
    # behavior), which would decorrelate the sun disk
    d32 = ibl.face_directions(32)
    env = jnp.clip(jnp.asarray(ibl.procedural_sky(32)), 0.0, 2.0)
    mips = ibl.prefilter_radiance(env, res=16, n_mips=3, n_samples=32)
    assert len(mips) == 3
    # mip 0 (roughness 0) should correlate strongly with the env itself
    d = ibl.face_directions(16)
    direct = np.asarray(ibl.sample_cubemap(env, d))
    m0 = np.asarray(mips[0])
    corr = np.corrcoef(direct.reshape(-1), m0.reshape(-1))[0, 1]
    assert corr > 0.95, corr


def test_eval_ibl_shapes_and_energy():
    env = jnp.asarray(ibl.procedural_sky(32))
    data = {
        "brdf_lut": ibl.integrate_specular_brdf(res=32, n_samples=64),
        "irradiance": ibl.sample_irradiance(env, out_res=8),
        "radiance_mips": ibl.prefilter_radiance(env, res=16, n_mips=3, n_samples=32),
    }
    R = 64
    rng = np.random.default_rng(1)
    n = rng.normal(size=(R, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    surface = {
        "normal_ws": jnp.asarray(n),
        "inv_view_ray": jnp.asarray(n),  # view along normal
        "albedo": jnp.full((R, 3), 0.5),
        "roughness": jnp.full((R,), 0.5),
        "metallic": jnp.zeros((R,)),
        "NoV": jnp.ones((R,)),
    }
    out = np.asarray(ibl.eval_ibl(surface, data))
    assert out.shape == (R, 3)
    assert (out >= 0).all() and np.isfinite(out).all()
    assert out.mean() > 0.01  # sky contributes energy


def test_prefilter_all_mips_finite():
    """Every prefiltered mip must be finite on every face.

    Regression: compiling all mips into one jit program miscompiled on
    the TPU stack (NaN on the -x/-y/+-z faces of mips 3-6);
    prefilter_radiance now dispatches one jit call per mip.
    """
    import numpy as np
    from prosper_tpu.ops.ibl import prefilter_radiance, procedural_sky

    mips = prefilter_radiance(procedural_sky(32), res=32, n_mips=6, n_samples=64)
    assert len(mips) == 6
    for m, mip in enumerate(mips):
        a = np.asarray(mip)
        assert np.isfinite(a).all(), f"mip {m} has non-finite texels"
