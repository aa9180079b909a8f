import numpy as np
import jax.numpy as jnp

from prosper_tpu.mathx import color, packing


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.random((256, 3), dtype=np.float32)
    hsv = color.rgb_to_hsv(jnp.asarray(rgb))
    back = np.asarray(color.hsv_to_rgb(hsv))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_hsv_known_values():
    # Pure red -> hue 0, sat 1, val 1
    hsv = np.asarray(color.rgb_to_hsv(jnp.array([[1.0, 0.0, 0.0]])))
    np.testing.assert_allclose(hsv[0], [0.0, 1.0, 1.0], atol=1e-6)
    # Pure green -> hue 2 (unscaled, x60 = 120deg)
    hsv = np.asarray(color.rgb_to_hsv(jnp.array([[0.0, 1.0, 0.0]])))
    np.testing.assert_allclose(hsv[0], [2.0, 1.0, 1.0], atol=1e-6)
    # Gray -> sat 0 hue 0
    hsv = np.asarray(color.rgb_to_hsv(jnp.array([[0.5, 0.5, 0.5]])))
    np.testing.assert_allclose(hsv[0], [0.0, 0.0, 0.5], atol=1e-6)


def test_luminance():
    y = float(color.luminance(jnp.array([1.0, 1.0, 1.0])))
    np.testing.assert_allclose(y, 1.0, atol=1e-6)


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 64, dtype=np.float32)
    back = np.asarray(color.srgb_to_linear(color.linear_to_srgb(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_snorm_10_10_10_2_roundtrip():
    rng = np.random.default_rng(1)
    v = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    w = np.where(rng.random(512) > 0.5, 1.0, -1.0).astype(np.float32)
    p = packing.pack_snorm_10_10_10_2(v, w)
    v2, w2 = packing.unpack_snorm_10_10_10_2(jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(v2), v, atol=1.5 / 511.0)
    np.testing.assert_array_equal(np.asarray(w2), w)


def test_signed_oct_roundtrip():
    rng = np.random.default_rng(2)
    n = rng.normal(size=(1024, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    e = packing.signed_oct_encode(jnp.asarray(n))
    d = np.asarray(packing.signed_oct_decode(e))
    # encode/decode via z-sign bit; direction should be preserved closely
    dots = np.sum(d * n, axis=-1)
    assert dots.min() > 0.9999
