import numpy as np

from prosper_tpu.io import ktx


def test_ktx_cubemap_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    m0 = rng.integers(0, 255, (6, 8, 8, 4), dtype=np.uint8)
    m1 = rng.integers(0, 255, (6, 4, 4, 4), dtype=np.uint8)
    p = str(tmp_path / "env.ktx")
    ktx.write_ktx(p, [m0, m1])
    img = ktx.read_ktx(p)
    assert img.faces == 6 and img.width == 8
    np.testing.assert_array_equal(img.mips[0], m0)
    np.testing.assert_array_equal(img.mips[1], m1)
    cube = ktx.ktx_to_cubemap(img)
    assert cube.shape == (6, 8, 8, 3)
    np.testing.assert_allclose(cube, m0[..., :3] / 255.0, atol=1e-6)


def test_ktx_2d_float(tmp_path):
    m0 = np.random.default_rng(1).random((1, 4, 4, 4)).astype(np.float32)
    p = str(tmp_path / "t.ktx")
    ktx.write_ktx(p, [m0], gl_internal=ktx.GL_RGBA32F)
    img = ktx.read_ktx(p)
    np.testing.assert_allclose(img.mips[0], m0, atol=1e-7)
