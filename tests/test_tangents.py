"""MikkTSpace-algorithm tangent generation (cpp/asset_pipeline.cpp
mikktspace_tangents + the numpy fallback) vs analytically-known
MikkTSpace outputs on canonical meshes."""

import numpy as np
import pytest

from prosper_tpu.scene import native


def _quad(mirror_u=False):
    """Flat XY quad with planar UVs; tangent is analytically +X
    (dP/du), sign +1 (or -X / -1 when the U axis is mirrored)."""
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    u = np.array([0, 1, 1, 0], np.float32)
    if mirror_u:
        u = 1.0 - u
    uv = np.stack([u, np.array([0, 0, 1, 1], np.float32)], axis=1)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    return pos, nrm, uv, tris


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_planar_quad_tangent_is_dpdu(impl, monkeypatch):
    if impl == "numpy":
        monkeypatch.setattr(native, "_load", lambda: None)
    pos, nrm, uv, tris = _quad()
    t = native.mikktspace_tangents(pos, nrm, uv, tris)
    np.testing.assert_allclose(t[:, :3], [[1, 0, 0]] * 4, atol=1e-6)
    np.testing.assert_allclose(t[:, 3], [1, 1, 1, 1])


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_mirrored_quad_flips_tangent_and_sign(impl, monkeypatch):
    if impl == "numpy":
        monkeypatch.setattr(native, "_load", lambda: None)
    pos, nrm, uv, tris = _quad(mirror_u=True)
    t = native.mikktspace_tangents(pos, nrm, uv, tris)
    np.testing.assert_allclose(t[:, :3], [[-1, 0, 0]] * 4, atol=1e-6)
    # mirrored parameterization -> handedness -1 (MikkTSpace fSign)
    np.testing.assert_allclose(t[:, 3], [-1, -1, -1, -1])


def test_native_matches_numpy_fallback(monkeypatch):
    """Random mesh: the C++ port and the vectorised fallback agree."""
    rng = np.random.default_rng(0)
    V, T = 64, 90
    pos = rng.normal(size=(V, 3)).astype(np.float32)
    nrm = rng.normal(size=(V, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    uv = rng.random((V, 2)).astype(np.float32)
    tris = rng.integers(0, V, (T, 3)).astype(np.uint32)
    native._TRIED = False
    native._LIB = None
    t_native = native.mikktspace_tangents(pos, nrm, uv, tris)
    if not native.available():
        pytest.skip("no toolchain")
    monkeypatch.setattr(native, "_load", lambda: None)
    t_np = native.mikktspace_tangents(pos, nrm, uv, tris)
    np.testing.assert_allclose(t_native, t_np, atol=2e-5)


def test_angle_weighting_beats_uniform_on_sliver():
    """The wedge-angle weighting must dominate: a sliver triangle with a
    rotated UV frame barely changes the welded vertex tangent."""
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [1e-3, -1e-3, 0]],
        np.float32,
    )
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (5, 1))
    uv = np.array(
        [[0, 0], [1, 0], [1, 1], [0, 1], [0.0, -1.0]], np.float32
    )  # sliver's UV makes its dP/du point along +Y-ish
    tris = np.array([[0, 1, 2], [0, 2, 3], [0, 4, 1]], np.uint32)
    t = native.mikktspace_tangents(pos, nrm, uv, tris)
    # vertex 0 touches the sliver, but its tiny corner angle keeps the
    # tangent locked to +X
    assert t[0, 0] > 0.99
