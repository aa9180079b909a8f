import numpy as np

from prosper_tpu.io import dds
from prosper_tpu.io.image import load_image_rgba8, write_png

LUT_PATH = "/root/reference/res/texture/tony_mc_mapface.dds"


def test_read_tony_mc_mapface_lut():
    img = dds.read_dds(LUT_PATH)
    assert img.dxgi_format == dds.DXGI_R9G9B9E5
    assert (img.width, img.height, img.depth) == (48, 48, 48)
    lut = img.mips[0]
    assert lut.shape == (48, 48, 48, 3)
    assert lut.dtype == np.float32
    # LUT output is display-referred [0,1]
    assert lut.min() >= 0.0 and lut.max() <= 1.0
    # black maps to (near) black, white-ish input to bright output
    assert lut[0, 0, 0].max() < 0.02
    assert lut[-1, -1, -1].min() > 0.9


def test_dds_rgba8_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    m0 = rng.integers(0, 255, (16, 16, 4), dtype=np.uint8)
    m1 = rng.integers(0, 255, (8, 8, 4), dtype=np.uint8)
    p = str(tmp_path / "t.dds")
    dds.write_dds_rgba8(p, [m0, m1], srgb=True)
    img = dds.read_dds(p)
    assert img.dxgi_format == dds.DXGI_R8G8B8A8_SRGB
    assert len(img.mips) == 2
    np.testing.assert_array_equal(img.mips[0], m0)
    np.testing.assert_array_equal(img.mips[1], m1)


def test_png_roundtrip(tmp_path):
    img = np.zeros((4, 4, 3), np.float32)
    img[0, 0] = [1, 0.5, 0]
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = load_image_rgba8(p)
    assert back.shape == (4, 4, 4)
    assert back[0, 0, 0] == 255


def test_load_flighthelmet_texture():
    tex = load_image_rgba8(
        "/root/reference/res/glTF/FlightHelmet/glTF/FlightHelmet_baseColor.png"
    )
    assert tex.ndim == 3 and tex.shape[2] == 4
