"""Bloom: multi-resolution blur and FFT-convolution techniques.

Parity with /root/reference/res/shader/bloom/* and src/render/bloom/*:
- Separate: threshold at half (bilinear quad centers) or quarter res
  (4-tap average) (separate.comp), threshold default 1.0
- Reduce: mip chain (box reduction, the SPD analog)
- Blur: per-mip separable 4-tap gaussian with the lisyarus offsets and
  weights + the procedural anamorphic streak on mip 1's horizontal pass
  (blur.comp:18-72)
- Compose: illumination + mip blend (0.9, 0.04, 0.04) (Compose.hpp:49)
- FFT path: procedural star/gauss/streak kernel (generate_kernel.comp),
  corner-wrap (prepare_kernel.comp), forward FFT, complex multiply with
  convolutionScale = 2/kernelDim (GenerateKernel.cpp:68), inverse FFT.
  jnp.fft (XLA) carries the transform; the radix Pallas FFT is a later
  perf option (SURVEY.md §7 stage 7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

THRESHOLD_DEFAULT = 1.0
BLEND_FACTORS = (0.9, 0.04, 0.04)

_OFFSETS = np.array(
    [-2.089779143016758, -0.38698196063011614, 1.2004365440663936, 3.0],
    np.float32,
)
_WEIGHTS = np.array(
    [0.0666055522709221, 0.6249460483713625, 0.3024686099546741, 0.005979789403041253],
    np.float32,
)


def _bilinear_uv(img, uv):
    """Bilinear sample, border transparent black; uv (..., 2)."""
    h, w = img.shape[:2]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def g(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        return jnp.where(inside[..., None], img[yi, xi], 0.0)

    return (
        g(y0, x0) * (1 - fx) * (1 - fy)
        + g(y0, x0 + 1) * fx * (1 - fy)
        + g(y0 + 1, x0) * (1 - fx) * fy
        + g(y0 + 1, x0 + 1) * fx * fy
    )


def separate(illumination: jnp.ndarray, threshold: float = THRESHOLD_DEFAULT,
             quarter: bool = False) -> jnp.ndarray:
    """Threshold highlights at half/quarter res (separate.comp)."""
    h, w = illumination.shape[:2]
    inv = jnp.array([1.0 / w, 1.0 / h], jnp.float32)
    if not quarter:
        oh, ow = h // 2, w // 2
        ys, xs = jnp.meshgrid(
            jnp.arange(oh, dtype=jnp.float32),
            jnp.arange(ow, dtype=jnp.float32),
            indexing="ij",
        )
        uv = jnp.stack([xs * 2, ys * 2], axis=-1) * inv
        out = _bilinear_uv(illumination, uv)
    else:
        oh, ow = h // 4, w // 4
        ys, xs = jnp.meshgrid(
            jnp.arange(oh, dtype=jnp.float32),
            jnp.arange(ow, dtype=jnp.float32),
            indexing="ij",
        )
        base = jnp.stack([xs * 4, ys * 4], axis=-1)
        acc = 0.0
        for off in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
            acc = acc + _bilinear_uv(
                illumination, (base + jnp.array(off, jnp.float32)) * inv
            )
        out = acc / 4.0
    return jnp.maximum(out - threshold, 0.0)


def reduce_mips(img: jnp.ndarray, n_mips: int = 3) -> list[jnp.ndarray]:
    """Box-filter mip chain (Reduce/SPD analog). Returns [mip0..mipN-1]."""
    mips = [img]
    for _ in range(n_mips - 1):
        m = mips[-1]
        h, w = m.shape[:2]
        m = m[: h // 2 * 2, : w // 2 * 2]
        mips.append(m.reshape(h // 2, 2, w // 2, 2, -1).mean(axis=(1, 3)))
    return mips


def _blur_pass(img: jnp.ndarray, vertical: bool, streak: bool) -> jnp.ndarray:
    h, w = img.shape[:2]
    inv = jnp.array([1.0 / w, 1.0 / h], jnp.float32)
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) + 0.5,
        jnp.arange(w, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    uv = jnp.stack([xs, ys], axis=-1) * inv
    direction = jnp.array([0.0, 1.0] if vertical else [1.0, 0.0], jnp.float32)
    out = jnp.zeros_like(img)
    for o, wgt in zip(_OFFSETS, _WEIGHTS):
        out = out + _bilinear_uv(img, uv + direction * o * inv) * wgt
    if streak:
        # anamorphic flare on the horizontal pass of mip 1 (blur.comp:52-70).
        # The GLSL loops +-halfWidth integer-pixel taps; integer offsets on
        # pixel centers are exact texel reads, so this is a 1D convolution
        # along x with a per-channel kernel — same math, no unrolling.
        shw = w // 2
        i = np.arange(-shw, shw, dtype=np.float64)
        t = np.clip(np.abs(i) / 10.0, 0.0, 1.0)[:, None]
        tint = np.array([0.05, 0.05, 1.0]) + (
            np.array([0.01, 0.01, 1.0]) - np.array([0.05, 0.05, 1.0])
        ) * t
        scale = (
            4.0
            * (np.abs(np.sin(i * 0.5)) + np.abs(np.cos(i * 0.95)) + np.abs(np.sin(i * 0.75)))
            * (150.0 / np.maximum(0.015 * i * i + np.abs(i), 1.0))
        )
        kern = (tint * scale[:, None] / (w * 2.0)).astype(np.float32)  # (K, 3)
        K = kern.shape[0]
        # sample at x+i: correlate; pad with zeros (border transparent black)
        padded = jnp.pad(img, ((0, 0), (shw, K - 1 - shw), (0, 0)))
        # depthwise conv: for each channel c, out[x] = sum_i kern[i,c]*img[x+i]
        lhs = padded[None]  # (1, H, Wp, 3)
        rhs = jnp.asarray(kern)[None, :, None, :]  # (1, K, 1, 3)
        conv = jax.lax.conv_general_dilated(
            lhs,
            rhs,
            (1, 1),
            "VALID",
            feature_group_count=3,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (1, H, W, 3)
        out = out + conv[0]
    return out


def multi_res_blur(highlights: jnp.ndarray, streak: bool = True) -> list[jnp.ndarray]:
    """Reduce + per-mip separable blur; returns blurred mips [0..2]."""
    mips = reduce_mips(highlights, 3)
    out = []
    for lvl, m in enumerate(mips):
        hpass = _blur_pass(m, vertical=False, streak=streak and lvl == 1)
        out.append(_blur_pass(hpass, vertical=True, streak=False))
    return out


def compose(
    illumination: jnp.ndarray,
    mips: list[jnp.ndarray],
    blend=BLEND_FACTORS,
) -> jnp.ndarray:
    """Upsample mips bilinearly to full res and blend (compose.comp)."""
    h, w = illumination.shape[:2]
    ys, xs = jnp.meshgrid(
        (jnp.arange(h, dtype=jnp.float32) + 0.5) / h,
        (jnp.arange(w, dtype=jnp.float32) + 0.5) / w,
        indexing="ij",
    )
    uv = jnp.stack([xs, ys], axis=-1)
    highlight = 0.0
    for m, b in zip(mips, blend):
        highlight = highlight + _bilinear_uv(m, uv) * b
    return illumination + highlight


def bloom_multi_res(
    illumination: jnp.ndarray,
    threshold: float = THRESHOLD_DEFAULT,
    quarter: bool = False,
    streak: bool = True,
) -> jnp.ndarray:
    """Full multi-res-blur bloom (default technique, Bloom.hpp:58)."""
    hl = separate(illumination, threshold, quarter)
    mips = multi_res_blur(hl, streak)
    return compose(illumination, mips)


# ---------------------------------------------------------------------------
# FFT technique


def _gaussian(x, a, b, c):
    return a * jnp.exp(-(x - b * b) / (2 * c * c))


def _sd_star(p, r, n, w):
    """iq's n-star SDF (generate_kernel.comp:22-46)."""
    m = n + w * (2.0 - n)
    an = np.pi / n
    en = np.pi / m
    racs = r * jnp.array([np.cos(an), np.sin(an)])
    ecs = jnp.array([np.cos(en), np.sin(en)])
    px = jnp.abs(p[..., 0])
    py = p[..., 1]
    bn = jnp.mod(jnp.arctan2(px, py), 2.0 * an) - an
    plen = jnp.sqrt(px * px + py * py)
    p2 = plen[..., None] * jnp.stack([jnp.cos(bn), jnp.abs(jnp.sin(bn))], -1)
    p2 = p2 - racs
    t = jnp.clip(-jnp.sum(p2 * ecs, -1), 0.0, racs[1] / ecs[1])
    p2 = p2 + ecs * t[..., None]
    return jnp.sqrt(jnp.sum(p2 * p2, -1)) * jnp.sign(p2[..., 0])


def _rotate(p, a):
    return jnp.stack(
        [
            np.cos(a) * p[..., 0] + np.sin(a) * p[..., 1],
            np.cos(a) * p[..., 1] - np.sin(a) * p[..., 0],
        ],
        axis=-1,
    )


def generate_kernel(dim: int, supersample: int = 4) -> jnp.ndarray:
    """Procedural star/halo kernel (generate_kernel.comp). Returns
    (dim, dim, 4) with the RG/BA filter split of the reference."""

    def filter_value(p):
        plen = jnp.sqrt(jnp.sum(p * p, -1))
        base = _gaussian(plen, 1.5, 0.0, 0.055)
        ret = jnp.stack([base, base, base, base], -1)
        d1 = _sd_star(p, 0.5, 4.0, 0.075)
        d2 = _sd_star(_rotate(p, np.pi / 4), 0.35, 4.0, 0.05)
        star = jnp.minimum(d1, d2) < 0
        ret = ret + jnp.where(star[..., None], ret, 0.0)
        px, py = p[..., 0], p[..., 1]
        line = jnp.abs(py) < 0.005
        tint = jnp.array([0.05, 0.05, 1.0, 1.0]) + (
            jnp.array([0.01, 0.01, 1.0, 1.0]) - jnp.array([0.05, 0.05, 1.0, 1.0])
        ) * jnp.clip(jnp.abs(px) * 6, 0, 1)[..., None]
        osc = (
            jnp.abs(jnp.sin(px * 50.0))
            + jnp.abs(jnp.cos(px * 95.0))
            + jnp.abs(jnp.sin(px * 75.0))
        )
        streak = 0.5 * tint * (osc * _gaussian(jnp.abs(px) * 10.0, 0.5, 1.0, 1.0))[..., None]
        return ret + jnp.where(line[..., None], streak, 0.0)

    ss = supersample
    px_size = 1.0 / (dim * ss)
    coords = (jnp.arange(dim * ss, dtype=jnp.float32) + 0.5) * px_size * 2.0 - 1.0
    py, px = jnp.meshgrid(coords, coords, indexing="ij")
    p = jnp.stack([px, py], axis=-1)
    v = filter_value(p)
    v = v.reshape(dim, ss, dim, ss, 4).mean(axis=(1, 3))
    return v


def prepare_kernel(kernel: jnp.ndarray, out_dim: int) -> jnp.ndarray:
    """Center->corner wrap + zero G/A (prepare_kernel.comp)."""
    k = kernel
    in_dim = k.shape[0]
    # place kernel center at (0,0) of the out image with wrap
    shift = in_dim // 2
    rolled = jnp.roll(k, (-shift, -shift), axis=(0, 1))
    out = jnp.zeros((out_dim, out_dim, 4), k.dtype)
    h = min(in_dim, out_dim)
    half = h // 2
    # corners of rolled map to corners of out
    out = out.at[:half, :half].set(rolled[:half, :half])
    out = out.at[:half, -half:].set(rolled[:half, -half:])
    out = out.at[-half:, :half].set(rolled[-half:, :half])
    out = out.at[-half:, -half:].set(rolled[-half:, -half:])
    out = out.at[..., 1].set(0.0)
    out = out.at[..., 3].set(0.0)
    return out


def bloom_fft(
    illumination: jnp.ndarray,
    threshold: float = THRESHOLD_DEFAULT,
    quarter: bool = False,
    kernel_image: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """FFT-convolution bloom. The kernel DFT is cacheable across frames
    (the reference preserves it, GenerateKernel releasePreserved)."""
    hl = separate(illumination, threshold, quarter)
    h, w = hl.shape[:2]
    dim = 1 << int(np.ceil(np.log2(max(h, w))))

    if kernel_image is None:
        kernel_image = generate_kernel(dim)
    kern = prepare_kernel(kernel_image, dim)

    pad = jnp.zeros((dim, dim, 3), hl.dtype).at[:h, :w].set(hl)
    scale = 2.0 / kernel_image.shape[0]

    f_img = jnp.fft.fft2(pad, axes=(0, 1))
    # R,G convolve with the R filter; B with the B filter (prepare_kernel
    # zeroes G/A so the packed RG/BA complex trick degenerates to this)
    f_k_r = jnp.fft.fft2(kern[..., 0])
    f_k_b = jnp.fft.fft2(kern[..., 2])
    f_out = jnp.stack(
        [
            f_img[..., 0] * f_k_r,
            f_img[..., 1] * f_k_r,
            f_img[..., 2] * f_k_b,
        ],
        axis=-1,
    )
    conv = jnp.real(jnp.fft.ifft2(f_out, axes=(0, 1))) * scale
    conv = jnp.maximum(conv[:h, :w], 0.0)
    return compose(illumination, [conv], blend=(1.0,))
