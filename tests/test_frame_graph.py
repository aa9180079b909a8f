"""Round-2 frame-graph completion: transparent pass, particles in the
deferred chain, FFT bloom via the mode entry, autofocus depth state.
(Renderer.cpp:485-584 pass order.)"""

import numpy as np
import jax.numpy as jnp

from prosper_tpu.testing import make_test_scene


def _scene_with_blend():
    """Test scene where box clusters 2,3 use a blend (alphaMode 2)
    half-transparent red material."""
    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    m = static["materials"]
    m = {k: np.concatenate([v, v[-1:]], axis=0) for k, v in m.items()}
    m["base_color_factor"][2] = [1.0, 0.1, 0.1, 0.5]
    m["alpha_mode"][2] = 2
    m["metallic_factor"][2] = 0.0
    m["roughness_factor"][2] = 0.9
    static["materials"] = m
    wc_mat = static["wc_material"].copy()
    wc_mat[2:] = 2
    static["wc_material"] = wc_mat
    static["wt_material"] = np.repeat(wc_mat, 128)
    return static, frame, arena, cam_fn


def _dev(d):
    return {
        k: (
            {kk: jnp.asarray(vv) for kk, vv in v.items()}
            if isinstance(v, dict)
            else jnp.asarray(v)
        )
        for k, v in d.items()
        if k not in ("scene_camera", "bvh_depth")
    }


def test_transparent_pass_blends():
    static, frame, arena, cam_fn = _scene_with_blend()
    W = H = 64
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    s, f, a = _dev(static), _dev(frame), _dev(arena)

    from prosper_tpu.render.transparent import blend_cluster_mask, transparent_pass

    mask = np.asarray(blend_cluster_mask(s))
    assert mask.tolist() == [False, False, True, True]

    hdr = jnp.full((H, W, 3), 0.2, jnp.float32)
    # opaque "background" at far distance everywhere
    z_opaque = jnp.full((H * W,), -50.0, jnp.float32)
    out = np.asarray(
        transparent_pass(s, f, a, cam, hdr, z_opaque, W, H)
    )
    base = np.asarray(hdr)
    changed = np.abs(out - base).max(axis=-1) > 1e-5
    assert changed.any(), "transparent boxes should alter some pixels"
    assert not changed.all(), "background pixels must be untouched"
    # blend with alpha 0.5: changed pixels keep half the background
    diff = out - 0.5 * base
    assert (diff[changed] >= -1e-5).all()


def test_forward_transparent_differs_from_opaque_only():
    static, frame, arena, cam_fn = _scene_with_blend()
    W = H = 48
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    s, f, a = _dev(static), _dev(frame), _dev(arena)
    lut = jnp.tile(
        jnp.linspace(0, 1, 48, dtype=jnp.float32)[None, None, :, None], (48, 48, 1, 3)
    )
    from prosper_tpu.render.forward import render_forward

    img_opaque = render_forward(s, f, a, cam, lut, W, H)
    img_blend = render_forward(s, f, a, cam, lut, W, H, use_transparent=True)
    assert float(jnp.abs(img_blend - img_opaque).max()) > 1e-4


def test_deferred_entry_particles_and_fft_bloom_state():
    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    W = H = 64
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    s, f, a = _dev(static), _dev(frame), _dev(arena)
    lut = jnp.tile(
        jnp.linspace(0, 1, 48, dtype=jnp.float32)[None, None, :, None], (48, 48, 1, 3)
    )
    from prosper_tpu.render.deferred import deferred_entry

    img, state = deferred_entry(
        static=s, frame=f, arena=a, cam=cam, lut=lut, width=W, height=H,
        use_particles=True, use_bloom=True, bloom_technique="fft",
    )
    assert img.shape == (H, W, 3)
    assert state["particles"] is not None
    assert state["bloom_kernel"] is not None
    assert state["depth"].shape == (H, W)
    k0 = state["bloom_kernel"]

    img2, state2 = deferred_entry(
        static=s, frame=f, arena=a, cam=cam, lut=lut, width=W, height=H,
        use_particles=True, use_bloom=True, bloom_technique="fft",
        state=state,
    )
    # kernel DFT source cached across frames (Bloom releasePreserved)
    assert state2["bloom_kernel"] is k0
    # particles advanced (spawn timers/lifetimes change)
    p1 = np.asarray(state["particles"]["velocity_spawntimer"])
    p2 = np.asarray(state2["particles"]["velocity_spawntimer"])
    assert not np.array_equal(p1, p2)
    assert np.isfinite(np.asarray(img2)).all()


def test_autofocus_pick_from_state_depth():
    static, frame, arena, cam_fn = make_test_scene(n_boxes=4)
    W = H = 64
    cam = {k: jnp.asarray(v) for k, v in cam_fn(W, H).items()}
    s, f, a = _dev(static), _dev(frame), _dev(arena)
    lut = jnp.tile(
        jnp.linspace(0, 1, 48, dtype=jnp.float32)[None, None, :, None], (48, 48, 1, 3)
    )
    from prosper_tpu.render.deferred import deferred_entry
    from prosper_tpu.render.readback import pick_focus_distance

    _, state = deferred_entry(
        static=s, frame=f, arena=a, cam=cam, lut=lut, width=W, height=H
    )
    depth = np.asarray(state["depth"])
    # pick a pixel that hit geometry (reverse-z: hits have depth > 0)
    ys, xs = np.nonzero(depth > 1e-6)
    assert len(ys) > 0
    uv = ((xs[0] + 0.5) / W, (ys[0] + 0.5) / H)
    focus = pick_focus_distance(state["depth"], cam, uv)
    # the box grid sits a handful of units from the test camera
    assert 1.0 < focus < 30.0


def test_texture_readback_queue_is_async():
    """queue() must not resolve the value on the host (App.cpp:607-631:
    the copy is polled ~2 frames later, never stalling the queueing
    frame). The pending slot must stay a device array until poll."""
    import jax

    from prosper_tpu.render.readback import TextureReadback, focus_from_depth

    rb = TextureReadback()
    img = jnp.ones((8, 8), jnp.float32) * 0.25
    rb.queue(img, (0.5, 0.5))
    assert isinstance(rb._pending, jax.Array)  # no host materialization
    v = rb.poll()
    assert float(v) == 0.25
    assert rb.poll() is None  # drained
    # focus conversion matches the blocking helper
    cam = {
        "camera_to_clip": np.diag([1.0, 1.0, 0.0, 1.0]).astype(np.float32),
        "near": 0.1,
    }
    cam["camera_to_clip"][2, 3] = 0.1
    assert focus_from_depth(0.5, cam) > 0.0
