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


def test_mesh_quantization_roundtrip():
    """packMeshData-analog quantization (Mesh.hpp:11-15 parity): f16x4
    positions, 10-10-10-2 snorm normals/tangents, f16 uv, u16 indices."""
    import numpy as np

    from prosper_tpu.scene.world import (
        dequantize_mesh_arrays,
        quantize_mesh_arrays,
    )

    rng = np.random.default_rng(3)
    V, T = 777, 400
    n = rng.normal(size=(V, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    t3 = rng.normal(size=(V, 3)).astype(np.float32)
    t3 /= np.linalg.norm(t3, axis=1, keepdims=True)
    a = {
        "positions": rng.uniform(-2, 2, (V, 3)).astype(np.float32),
        "normals": n,
        "tangents": np.concatenate(
            [t3, rng.choice([-1.0, 1.0], (V, 1))], 1
        ).astype(np.float32),
        "uv0": rng.uniform(0, 1, (V, 2)).astype(np.float32),
        "tri_vidx": rng.integers(0, V, (T, 3)).astype(np.uint32),
        "cluster_offset": np.zeros(2, np.uint32),
    }
    q = quantize_mesh_arrays(a)
    assert q["positions_f16"].dtype == np.float16
    assert q["normals_1010102"].dtype == np.uint32
    assert q["tri_vidx"].dtype == np.uint16  # V <= 65535
    d = dequantize_mesh_arrays(q)
    assert np.abs(d["positions"] - a["positions"]).max() < 1e-3
    dn = d["normals"] / np.linalg.norm(d["normals"], axis=1, keepdims=True)
    assert (dn * a["normals"]).sum(1).min() > 0.99999
    dt = d["tangents"][:, :3]
    dt = dt / np.linalg.norm(dt, axis=1, keepdims=True)
    assert (dt * a["tangents"][:, :3]).sum(1).min() > 0.99999
    assert np.array_equal(
        np.sign(d["tangents"][:, 3]), np.sign(a["tangents"][:, 3])
    )
    assert np.array_equal(d["tri_vidx"], a["tri_vidx"])
    assert np.abs(d["uv0"] - a["uv0"]).max() < 5e-4
