"""Structural similarity (SSIM) matching scikit-image defaults.

The prediction pipeline scores warped frames with
``skimage.metrics.structural_similarity(true[:,:,2], pred[:,:,2],
data_range=255.0)`` (optical_flow_prediction.py:113-115).  scikit-image's
defaults are: 7×7 uniform filter, K1=0.01, K2=0.03, sample covariance
normalisation N/(N-1), and the mean taken over the map cropped by
(win_size-1)//2 on every side — reproduced here in jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _uniform_filter(x: Array, size: int) -> Array:
    """Mean filter with edge (replicate) padding.  Padding mode is
    irrelevant to the final score because the affected border band is
    cropped before averaging (crop width == filter radius)."""
    r = size // 2
    xp = jnp.pad(x, r, mode="edge")
    k = jnp.full((size, size), 1.0 / (size * size), x.dtype)
    # f32 accumulation pinned: under the TPU default (bf16 conv inputs)
    # the moment filters lose ~3 digits and per-window SSIM can exceed 1
    return jax.lax.conv_general_dilated(
        xp[None, None],
        k[None, None],
        (1, 1),
        "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]


def ssim(
    im1: Array,
    im2: Array,
    data_range: float = 255.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> Array:
    """Scalar mean SSIM between two single-channel images."""
    x = jnp.asarray(im1, jnp.float32)
    y = jnp.asarray(im2, jnp.float32)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)

    # Center on the global mean before the moment filters: E[x²]−E[x]² in
    # float32 loses ~3 digits on 0..255 imagery; the centered form is exact
    # to float32 precision and TPU-friendly (no float64 needed).
    mx = jnp.mean(x)
    my = jnp.mean(y)
    xc = x - mx
    yc = y - my
    uxc = _uniform_filter(xc, win_size)
    uyc = _uniform_filter(yc, win_size)
    ux = uxc + mx
    uy = uyc + my
    vx = cov_norm * (_uniform_filter(xc * xc, win_size) - uxc * uxc)
    vy = cov_norm * (_uniform_filter(yc * yc, win_size) - uyc * uyc)
    vxy = cov_norm * (_uniform_filter(xc * yc, win_size) - uxc * uyc)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    return jnp.mean(s[pad:-pad, pad:-pad])
