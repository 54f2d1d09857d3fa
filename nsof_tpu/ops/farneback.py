"""Dense Farnebäck optical flow in pure JAX, OpenCV-semantics-compatible.

This is the velocity-inference backend the reference uses for every headline
pipeline (``cv2.calcOpticalFlowFarneback``, optical_flow_seg.py:158/203/494)
and the north-star op of this framework.  The implementation follows the
algorithm of Farnebäck, "Two-frame motion estimation based on polynomial
expansion" (SCIA 2003), with OpenCV's specific numerical choices replicated
so that flows match ``cv2`` to sub-pixel EPE:

- polynomial expansion via separable Gaussian-weighted least squares with
  OpenCV's inverse-moment shortcut (only the (0,3) and (3,3) entries of the
  inverse moment matrix are used for the quadratic terms);
- displacement update matrices with bilinear sampling of the second
  expansion at the warped position, out-of-bounds handled by zeroing the
  b-difference and halving the cross term;
- the 5-entry border attenuation table near image edges;
- box "smoothing" that sums a (2·(winsize//2)+1)² window but normalises by
  winsize² (exact mean for odd winsize, OpenCV's quirk for even);
- pyramid levels clipped so no level goes below 32 px, per-level Gaussian
  pre-smoothing with σ = (1/scale − 1)/2 (σ=0 at full resolution → OpenCV's
  fixed [1,2,1]/4 binomial kernel), INTER_LINEAR resampling with half-pixel
  centres, and inter-level flow upscaling by 1/pyr_scale.

Everything is static-shape, jit-able, differentiable, and vmap-batchable.
The pipelines apply the reference's Farnebäck sign flip (``flow = -flow``,
optical_flow_seg.py:460-461) at the call site, not here.

Known divergence (documented, intentional): OpenCV's box smoothing is
left/right *asymmetric* at the image border — flipping the input image
horizontally and unflipping the result does not reproduce
``cv2.calcOpticalFlowFarneback``'s own output in the last ``winsize//2 + 1``
columns/rows (verified empirically).  This implementation is symmetric and
matches cv2's left/top border exactly; in the right/bottom band of
``winsize//2 + 1`` pixels flows can differ (cv2's values there are unstable
— hundreds of px on a 160 px image with the winsize-3/4 presets — while ours
stay bounded).  Interior parity is ~1e-5 px EPE.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class FarnebackParams:
    """Mirror of the cv2 parameter dict (optical_flow_seg.py:73-81)."""

    pyr_scale: float = 0.5
    levels: int = 3
    winsize: int = 15
    iterations: int = 3
    poly_n: int = 5
    poly_sigma: float = 1.2
    # flags: only the box-filter path (flags=0) is implemented; the
    # reference never sets OPTFLOW_FARNEBACK_GAUSSIAN.


# Presets appearing in the reference scripts (commented blocks,
# optical_flow_seg.py:61-112).
PRESETS = {
    "grasp": FarnebackParams(0.5, 3, 15, 3, 5, 1.2),
    "uavnew2": FarnebackParams(0.5, 3, 15, 3, 5, 1.2),
    "tabletennis": FarnebackParams(0.6, 3, 4, 2, 1, 1.05),
    "autodriving": FarnebackParams(0.6, 3, 3, 3, 10, 1.05),
    "uav": FarnebackParams(0.6, 3, 3, 3, 10, 1.05),
}


# ── polynomial expansion ──────────────────────────────────────────────────


@functools.lru_cache(maxsize=None)
def _poly_exp_coeffs(n: int, sigma: float):
    """Gaussian basis kernels and the inverse-moment scalars.

    Replicates OpenCV's FarnebackPrepareGaussian: kernels g, x·g, x²·g with g
    normalised to Σg = 1, and the entries (1,1), (0,3), (3,3), (5,5) of the
    inverse of the 6×6 moment matrix for basis (1, x, y, x², y², xy).
    """
    if sigma < 1.19209290e-07:
        sigma = n * 0.3
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g

    m2 = float((g * x * x).sum())
    m4 = float((g * x**4).sum())
    # 6×6 moment matrix G for w(x,y) = g(x)g(y), basis (1, x, y, x², y², xy)
    G = np.zeros((6, 6))
    G[0, 0] = 1.0
    G[1, 1] = G[2, 2] = m2
    G[0, 3] = G[0, 4] = G[3, 0] = G[4, 0] = m2
    G[3, 3] = G[4, 4] = m4
    G[3, 4] = G[4, 3] = m2 * m2
    G[5, 5] = m2 * m2
    invG = np.linalg.inv(G)
    ig11 = invG[1, 1]
    ig03 = invG[0, 3]
    ig33 = invG[3, 3]
    ig55 = invG[5, 5]
    return (
        g.astype(np.float32),
        xg.astype(np.float32),
        xxg.astype(np.float32),
        float(ig11),
        float(ig03),
        float(ig33),
        float(ig55),
    )


def _conv1d(img: Array, kernel: np.ndarray, axis: int) -> Array:
    """Correlate along one axis with replicate (edge) padding."""
    k = len(kernel)
    n = k // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (n, n)
    xp = jnp.pad(img, pad, mode="edge")
    # XLA's conv_general_dilated is cross-correlation (no kernel flip),
    # which is exactly OpenCV's sepFilter2D semantics.
    kern = jnp.asarray(kernel, img.dtype)
    if axis == 0:
        kern = kern.reshape(k, 1)
    else:
        kern = kern.reshape(1, k)
    return jax.lax.conv_general_dilated(
        xp[None, None],
        kern[None, None],
        (1, 1),
        "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]


def poly_expansion(img: Array, n: int, sigma: float) -> Array:
    """Quadratic polynomial expansion of a [H, W] float image.

    Returns R [H, W, 5] with channels (b_y, b_x, a_yy, a_xx, a_xy·1) laid
    out to match OpenCV's FarnebackPolyExp output (channel 0 pairs with the
    row displacement in the update matrices).
    """
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_coeffs(n, sigma)
    img = jnp.asarray(img, jnp.float32)

    # vertical pass (axis 0 = y)
    s0 = _conv1d(img, g, 0)
    s1 = _conv1d(img, xg, 0)
    s2 = _conv1d(img, xxg, 0)
    # horizontal pass (axis 1 = x)
    b1 = _conv1d(s0, g, 1)  # ΣΣ g g I
    b2 = _conv1d(s1, g, 1)  # y-moment
    b3 = _conv1d(s0, xg, 1)  # x-moment
    b4 = _conv1d(s0, xxg, 1)  # x² moment
    b5 = _conv1d(s2, g, 1)  # y² moment
    b6 = _conv1d(s1, xg, 1)  # xy moment

    r0 = b2 * ig11  # y linear coeff
    r1 = b3 * ig11  # x linear coeff
    r2 = b1 * ig03 + b5 * ig33  # y² coeff (OpenCV's two-term shortcut)
    r3 = b1 * ig03 + b4 * ig33  # x² coeff
    r4 = b6 * ig55  # xy coeff
    return jnp.stack([r0, r1, r2, r3, r4], axis=-1)


# ── displacement update matrices ─────────────────────────────────────────

_BORDER_TABLE = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472], np.float32)
_BORDER = 5


def _border_scale(h: int, w: int) -> Array:
    """Per-pixel attenuation near image edges (OpenCV's border[] table)."""
    def axis_scale(size):
        idx = np.arange(size)
        s = np.ones(size, np.float32)
        for i in range(min(_BORDER, size)):
            s[i] *= _BORDER_TABLE[i]
            s[size - 1 - i] *= _BORDER_TABLE[i]
        return s

    return jnp.asarray(np.outer(axis_scale(h), axis_scale(w)))


def _sample_r1(r1: Array, fx: Array, fy: Array):
    """Bilinear sample of the 5-channel expansion at float coords, with
    OpenCV's out-of-bounds rule signalled via the returned mask."""
    h, w = r1.shape[:2]
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    inb = (x0 >= 0) & (x0 < w - 1) & (y0 >= 0) & (y0 < h - 1)
    ax = fx - x0
    ay = fy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    a00 = (1 - ax) * (1 - ay)
    a01 = ax * (1 - ay)
    a10 = (1 - ax) * ay
    a11 = ax * ay
    samp = (
        r1[y0i, x0i] * a00[..., None]
        + r1[y0i, x1i] * a01[..., None]
        + r1[y1i, x0i] * a10[..., None]
        + r1[y1i, x1i] * a11[..., None]
    )
    return samp, inb


def update_matrices(r0: Array, r1: Array, flow: Array) -> Array:
    """Build the 5-channel least-squares system M from two expansions and
    the current flow (OpenCV FarnebackUpdateMatrices)."""
    h, w = r0.shape[:2]
    dx = flow[..., 0]
    dy = flow[..., 1]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    samp, inb = _sample_r1(r1, xs + dx, ys + dy)

    r4_in = (r0[..., 2] + samp[..., 2]) * 0.5
    r5_in = (r0[..., 3] + samp[..., 3]) * 0.5
    r6_in = (r0[..., 4] + samp[..., 4]) * 0.25
    r4 = jnp.where(inb, r4_in, r0[..., 2])
    r5 = jnp.where(inb, r5_in, r0[..., 3])
    r6 = jnp.where(inb, r6_in, r0[..., 4] * 0.5)
    b_y = jnp.where(inb, (r0[..., 0] - samp[..., 0]) * 0.5, 0.0)
    b_x = jnp.where(inb, (r0[..., 1] - samp[..., 1]) * 0.5, 0.0)

    r2 = b_y + r4 * dy + r6 * dx
    r3 = b_x + r6 * dy + r5 * dx

    scale = _border_scale(h, w)
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    m = jnp.stack(
        [
            r4 * r4 + r6 * r6,
            (r4 + r5) * r6,
            r5 * r5 + r6 * r6,
            r4 * r2 + r6 * r3,
            r6 * r2 + r5 * r3,
        ],
        axis=-1,
    )
    return m


def _box_sum(x: Array, m: int) -> Array:
    """(2m+1)² box sum with replicate borders, separable."""
    k = np.ones(2 * m + 1, np.float32)
    return _conv1d(_conv1d(x, k, 0), k, 1)


def update_flow_blur(
    r0: Array, r1: Array, flow: Array, m: Array, winsize: int,
    update_mats: bool,
):
    """One box-filter solve iteration (OpenCV FarnebackUpdateFlow_Blur):
    box-smooth M, solve the regularised 2×2 system per pixel, optionally
    rebuild M with the new flow."""
    half = winsize // 2
    scale = 1.0 / (winsize * winsize)
    g11 = _box_sum(m[..., 0], half) * scale
    g12 = _box_sum(m[..., 1], half) * scale
    g22 = _box_sum(m[..., 2], half) * scale
    h1 = _box_sum(m[..., 3], half) * scale
    h2 = _box_sum(m[..., 4], half) * scale
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    new_dx = (g11 * h2 - g12 * h1) * idet
    new_dy = (g22 * h1 - g12 * h2) * idet
    flow = jnp.stack([new_dx, new_dy], axis=-1)
    if update_mats:
        m = update_matrices(r0, r1, flow)
    return flow, m


# ── pyramid driver ────────────────────────────────────────────────────────


def _cv_round(v: float) -> int:
    """cvRound: round half to even (C rint)."""
    f = math.floor(v)
    diff = v - f
    if diff > 0.5:
        return f + 1
    if diff < 0.5:
        return f
    return f + (f % 2)


def _gaussian_blur_kernel(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel semantics, including the fixed small kernels
    when sigma <= 0."""
    if sigma <= 0:
        fixed = {
            1: [1.0],
            3: [0.25, 0.5, 0.25],
            5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
            7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375,
                0.03125],
        }
        if ksize in fixed:
            return np.asarray(fixed[ksize], np.float32)
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def _gaussian_blur(img: Array, ksize: int, sigma: float) -> Array:
    """Separable Gaussian blur with reflect-101 borders (BORDER_DEFAULT)."""
    k = _gaussian_blur_kernel(ksize, sigma)
    n = ksize // 2
    xp = jnp.pad(img, ((n, n), (n, n)), mode="reflect")
    tmp = jax.lax.conv_general_dilated(
        xp[None, None],
        jnp.asarray(k).reshape(1, 1, ksize, 1),
        (1, 1),
        "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = jax.lax.conv_general_dilated(
        tmp,
        jnp.asarray(k).reshape(1, 1, 1, ksize),
        (1, 1),
        "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def _resize_linear(img: Array, out_h: int, out_w: int) -> Array:
    """cv2 INTER_LINEAR resize (half-pixel centres, no antialias)."""
    if img.shape[-2:] == (out_h, out_w) and img.ndim == 2:
        return img
    if img.ndim == 2:
        return jax.image.resize(img, (out_h, out_w), "bilinear",
                                antialias=False)
    return jax.image.resize(
        img, (out_h, out_w, img.shape[-1]), "bilinear", antialias=False
    )


def _effective_levels(h: int, w: int, levels: int, pyr_scale: float) -> int:
    """OpenCV clips pyramid depth so no level goes below 32 px."""
    min_size = 32
    k = 0
    scale = 1.0
    while k < levels:
        scale *= pyr_scale
        if w * scale < min_size or h * scale < min_size:
            break
        k += 1
    return k


@functools.partial(jax.jit, static_argnames=("params",))
def farneback(
    prev_gray: Array,
    next_gray: Array,
    params: FarnebackParams = FarnebackParams(),
) -> Array:
    """Dense optical flow between two [H, W] grayscale images.

    Drop-in equivalent of ``cv2.calcOpticalFlowFarneback(prev, next, None,
    pyr_scale, levels, winsize, iterations, poly_n, poly_sigma, 0)``;
    returns flow [H, W, 2] with (dx, dy) channels.  Input may be uint8 or
    float; computation is float32.
    """
    # OpenCV parity requires true float32 conv math; TPU's default
    # bfloat16 matmul precision destroys the sub-pixel solve, so pin the
    # precision for everything traced in this op.
    with jax.default_matmul_precision("float32"):
        return _farneback_f32(prev_gray, next_gray, params)


def _farneback_f32(prev_gray, next_gray, params):
    h, w = prev_gray.shape
    img0 = jnp.asarray(prev_gray, jnp.float32)
    img1 = jnp.asarray(next_gray, jnp.float32)

    levels = _effective_levels(h, w, params.levels, params.pyr_scale)
    flow = None
    for k in range(levels, -1, -1):
        scale = params.pyr_scale**k
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = _cv_round(sigma * 5) | 1
        smooth_sz = max(smooth_sz, 3)
        wk = _cv_round(w * scale)
        hk = _cv_round(h * scale)

        if flow is None:
            flow = jnp.zeros((hk, wk, 2), jnp.float32)
        else:
            flow = _resize_linear(flow, hk, wk) * (1.0 / params.pyr_scale)

        i0 = _resize_linear(_gaussian_blur(img0, smooth_sz, sigma), hk, wk)
        i1 = _resize_linear(_gaussian_blur(img1, smooth_sz, sigma), hk, wk)
        r0 = poly_expansion(i0, params.poly_n, params.poly_sigma)
        r1 = poly_expansion(i1, params.poly_n, params.poly_sigma)
        m = update_matrices(r0, r1, flow)
        for i in range(params.iterations):
            flow, m = update_flow_blur(
                r0, r1, flow, m, params.winsize,
                update_mats=i < params.iterations - 1,
            )
    return flow


@functools.partial(jax.jit, static_argnames=("params",))
def farneback_batch(prev: Array, nxt: Array,
                    params: FarnebackParams = FarnebackParams()) -> Array:
    """vmap-batched flow over [B, H, W] image stacks."""
    return jax.vmap(lambda a, b: farneback(a, b, params))(prev, nxt)
