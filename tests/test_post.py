"""Post chain: TAA, bloom, DoF sanity/invariance tests."""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.ops import bloom, dof, taa


def test_taa_static_scene_fixed_point():
    """Zero velocity + identical history: the blend is an exact fixed
    point when clipping is off (variance clip intentionally pulls noisy
    history toward the neighborhood mean, so it is excluded here)."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((32, 32, 3), dtype=np.float32))
    vel = jnp.zeros((32, 32, 2))
    depth = jnp.full((32, 32), 0.5)
    out = taa.taa_resolve(img, img, vel, depth, color_clipping="none")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_taa_variance_clip_bounds_history():
    """Variance-clipped history stays within mu +- sigma of the 3x3
    current neighborhood (Salvi clip semantics)."""
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
    prev = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32) * 5)
    clipped = np.asarray(taa.variance_clip(img, prev))
    n = np.asarray(taa._shifts_3x3(img))
    mu = n.mean(axis=0)
    sigma = np.sqrt(np.maximum((n * n).mean(axis=0) - mu * mu, 0))
    assert (clipped <= mu + sigma + 1e-5).all()
    assert (clipped >= mu - sigma - 1e-5).all()


def test_taa_ignore_history_passthrough():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
    out = taa.taa_resolve(
        img, jnp.zeros_like(img), jnp.zeros((16, 16, 2)), jnp.zeros((16, 16)),
        ignore_history=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_taa_clips_ghosting():
    """History far outside the neighborhood is clipped toward current."""
    img = jnp.full((16, 16, 3), 0.2)
    history = jnp.full((16, 16, 3), 10.0)  # stale bright ghost
    out = taa.taa_resolve(
        img, history, jnp.zeros((16, 16, 2)), jnp.zeros((16, 16)),
        color_clipping="variance",
    )
    assert float(np.asarray(out).max()) < 0.5  # clip kills the ghost


def test_taa_offscreen_reprojection_passthrough():
    img = jnp.full((16, 16, 3), 0.3)
    history = jnp.full((16, 16, 3), 1.0)
    vel = jnp.full((16, 16, 2), 10.0)  # reprojects far off screen
    out = taa.taa_resolve(
        img, history, vel, jnp.zeros((16, 16)), velocity_sampling="center"
    )
    np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-6)


def test_bloom_threshold():
    """Dark image -> no bloom; bright spot -> light spreads."""
    dark = jnp.full((64, 64, 3), 0.5)
    out = bloom.bloom_multi_res(dark, streak=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dark), atol=1e-5)

    bright = dark.at[32, 32].set(50.0)
    out2 = np.asarray(bloom.bloom_multi_res(bright, streak=False))
    # energy added around the spot
    neighborhood = out2[28:38, 28:38].mean()
    assert neighborhood > 0.5 + 1e-3
    # far corner unaffected (beyond all blur taps)
    np.testing.assert_allclose(out2[:6, :6], 0.5, atol=1e-4)


def test_bloom_fft_spreads_highlight():
    dark = jnp.full((64, 64, 3), 0.0)
    bright = dark.at[32, 32].set(200.0).at[32, 33].set(200.0)
    kernel = bloom.generate_kernel(64, supersample=2)
    out = np.asarray(bloom.bloom_fft(bright, kernel_image=kernel))
    assert out[32, 32].sum() > 0
    # kernel has wide support: streak/halo reaches many pixels
    assert (out[30:35, :].sum(axis=-1) > 1e-5).sum() > 20


def test_dof_in_focus_unchanged():
    """Surfaces at the focus distance keep their sharp color."""
    cam = {
        "focus_distance": jnp.float32(5.0),
        "focal_length": jnp.float32(0.035),
        "aperture_diameter": jnp.float32(0.01),
    }
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((64, 64, 3), dtype=np.float32))
    depth = jnp.full((64, 64), 5.0)  # everything exactly in focus
    out = np.asarray(dof.depth_of_field(img, depth, cam))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-3)


def test_dof_defocused_background_blurs():
    # wide aperture so the background CoC spans several pixels even at
    # this tiny 64px test resolution (maxBgCoC ~ 6.6 half-res px)
    cam = {
        "focus_distance": jnp.float32(1.0),
        "focal_length": jnp.float32(0.035),
        "aperture_diameter": jnp.float32(0.2),
    }
    rng = np.random.default_rng(3)
    # high-frequency noise at far distance -> should blur out
    img = jnp.asarray((rng.random((64, 64, 3)) > 0.5).astype(np.float32))
    depth = jnp.full((64, 64), 50.0)
    out = np.asarray(dof.depth_of_field(img, depth, cam))
    assert out[8:-8, 8:-8].std() < 0.9 * np.asarray(img)[8:-8, 8:-8].std()


def test_lut_packed_rows_match_corner_gathers():
    """pack_lut_quads' single-gather trilinear fetch must equal the raw
    8-corner path (both live in sample_lut_trilinear)."""
    import numpy as np
    import jax.numpy as jnp

    from prosper_tpu.ops.tonemap import (
        LUT_DIMS,
        pack_lut_quads,
        sample_lut_trilinear,
    )

    rng = np.random.default_rng(5)
    raw = rng.random((LUT_DIMS, LUT_DIMS, LUT_DIMS, 3)).astype(np.float32)
    packed = jnp.asarray(pack_lut_quads(raw))
    uvw = jnp.asarray(rng.random((777, 3), dtype=np.float32))
    a = np.asarray(sample_lut_trilinear(packed, uvw))
    b = np.asarray(sample_lut_trilinear(jnp.asarray(raw), uvw))
    assert np.allclose(a, b, atol=1e-6), np.abs(a - b).max()
