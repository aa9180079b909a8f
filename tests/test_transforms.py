import numpy as np

from prosper_tpu.mathx import transforms as T


def test_quat_identity():
    m = T.quat_to_mat3(np.array([0.0, 0.0, 0.0, 1.0]))
    np.testing.assert_allclose(m, np.eye(3), atol=1e-6)


def test_quat_90deg_z():
    q = np.array([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
    m = T.quat_to_mat3(q)
    np.testing.assert_allclose(m @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


def test_trs_order():
    # translate * rotate * scale: scale applies first
    t = np.array([1.0, 0, 0])
    q = np.array([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)])  # 90deg z
    s = np.array([2.0, 1.0, 1.0])
    m = T.trs_to_mat4(t, q, s)
    p = m @ np.array([1.0, 0, 0, 1.0])
    # scale: (2,0,0); rotate: (0,2,0); translate: (1,2,0)
    np.testing.assert_allclose(p[:3], [1, 2, 0], atol=1e-6)


def test_look_at_maps_eye_to_origin():
    w2c = T.look_at(np.array([1.0, 2, 3]), np.array([0.0, 0, 0]), np.array([0.0, 1, 0]))
    p = w2c @ np.array([1.0, 2, 3, 1.0])
    np.testing.assert_allclose(p[:3], 0, atol=1e-6)
    # target should be on -z in camera space
    p = w2c @ np.array([0.0, 0, 0, 1.0])
    assert p[2] < 0
    np.testing.assert_allclose(p[:2], 0, atol=1e-6)


def test_reverse_z_projection():
    # near plane -> depth 1, far plane -> depth 0 (reverse z in [0,1])
    zn, zf = 0.1, 100.0
    proj = T.perspective_reverse_z(np.pi / 3, 16 / 9, zn, zf)
    p_near = proj @ np.array([0.0, 0, -zn, 1.0])
    p_far = proj @ np.array([0.0, 0, -zf, 1.0])
    np.testing.assert_allclose(p_near[2] / p_near[3], 1.0, atol=1e-5)
    np.testing.assert_allclose(p_far[2] / p_far[3], 0.0, atol=1e-5)


def test_frustum_planes_contain_interior_point():
    eye = np.array([0.0, 0, 0], np.float32)
    w2c = T.look_at(eye, np.array([0.0, 0, -1]), np.array([0.0, 1, 0]))
    corners = T.frustum_corners(eye, w2c, np.pi / 3, 1.0, 0.1, 100.0)
    planes = T.frustum_planes(corners)
    # A point straight ahead is inside: signed distance >= 0 for all planes
    p = np.array([0.0, 0.0, -10.0])
    for pl in planes:
        assert np.dot(pl[:3], p) + pl[3] > 0, pl


def test_jittered_projection_shifts_ndc():
    zn, zf = 0.1, 100.0
    j = (0.001, -0.002)
    p0 = T.perspective_reverse_z(np.pi / 3, 1.0, zn, zf, (0, 0))
    p1 = T.perspective_reverse_z(np.pi / 3, 1.0, zn, zf, j)
    v = np.array([0.0, 0.0, -10.0, 1.0])
    a = p0 @ v
    b = p1 @ v
    # In final (y-flipped) clip space, NDC shifts by exactly +jitter; the
    # shaders unjitter with `posNDC.xy - camera.currentJitter`
    # (gbuffer.frag:77-78), which this sign convention makes valid.
    np.testing.assert_allclose((b[:2] / b[3]) - (a[:2] / a[3]), j, atol=1e-6)
