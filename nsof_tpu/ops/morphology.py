"""Binary morphology with OpenCV-matching structuring elements and anchors.

The reference's task heads run repeated dilate/erode with an elliptical
structuring element (optical_flow_seg.py:349-352: 10×10 ellipse × 5
iterations; optical_flow_ob.py:344-345: 3×3 ellipse MORPH_CLOSE).  On TPU,
binary dilation/erosion become small convolutions (a handful of MACs per
pixel, fused by XLA); border semantics replicate OpenCV's
``morphologyDefaultBorderValue`` (-inf for dilate, +inf for erode, i.e. the
border never dilates in and never erodes in).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@functools.lru_cache(maxsize=None)
def ellipse_se(rows: int, cols: int) -> np.ndarray:
    """``cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (cols, rows))``.

    OpenCV fills, per row i, the span ``[c - dx, c + dx]`` where
    ``dx = c * sqrt(r² - dy²) / r`` with integer truncation, anchor
    ``(r, c) = (rows//2, cols//2)``.
    """
    r, c = rows // 2, cols // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    se = np.zeros((rows, cols), np.uint8)
    for i in range(rows):
        dy = i - r
        if abs(dy) <= r:
            dx = int(round(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, cols)
            se[i, j1:j2] = 1
        # rows below 2r+1 in an even-sized kernel stay empty, as in OpenCV
    return se


def _corr_count(x01: Array, se: np.ndarray, pad_value: int) -> Array:
    """Correlation of a {0,1} image with the SE, OpenCV anchor alignment.

    Empirically verified against cv2 ≥5: both dilate and erode correlate the
    un-flipped SE with anchor = ksize//2 (window offsets [-k//2, k-1-k//2]).
    """
    kh, kw = se.shape
    ay, ax = kh // 2, kw // 2
    top, bot, left, right = ay, kh - 1 - ay, ax, kw - 1 - ax
    xp = jnp.pad(
        x01, [(top, bot), (left, right)], constant_values=pad_value
    ).astype(jnp.float32)
    # XLA convs are cross-correlations — no kernel flip needed.
    k = jnp.asarray(se, jnp.float32)
    out = jax.lax.conv_general_dilated(
        xp[None, None],
        k[None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return out


def dilate_binary(mask: Array, se: np.ndarray) -> Array:
    """Binary dilation: ``cv2.dilate`` on a {0,255} uint8 mask."""
    x01 = (mask > 0).astype(jnp.float32)
    cnt = _corr_count(x01, se, 0)
    return jnp.where(cnt > 0, 255, 0).astype(jnp.uint8)


def erode_binary(mask: Array, se: np.ndarray) -> Array:
    """Binary erosion: ``cv2.erode`` on a {0,255} uint8 mask (border = +inf,
    i.e. padding counts as foreground)."""
    x01 = (mask > 0).astype(jnp.float32)
    cnt = _corr_count(x01, se, 1)
    full = int(se.sum())
    return jnp.where(cnt >= full, 255, 0).astype(jnp.uint8)


def morph_close(mask: Array, se: np.ndarray) -> Array:
    """``cv2.morphologyEx(mask, cv2.MORPH_CLOSE, se)`` = dilate then erode."""
    return erode_binary(dilate_binary(mask, se), se)


def _gray_reduce(img: Array, se: np.ndarray, op) -> Array:
    """Grayscale max/min filter over the SE support (shift-and-reduce; the
    SEs used by the reference have ≤ a few dozen taps)."""
    kh, kw = se.shape
    ay, ax = kh // 2, kw // 2
    pad_val = 0 if op is jnp.maximum else 255
    xp = jnp.pad(
        img,
        [(ay, kh - 1 - ay), (ax, kw - 1 - ax)],
        constant_values=pad_val,
    )
    h, w = img.shape
    out = None
    for dy in range(kh):
        for dx in range(kw):
            if se[dy, dx]:
                piece = jax.lax.dynamic_slice(xp, (dy, dx), (h, w))
                out = piece if out is None else op(out, piece)
    return out


def dilate_gray(img: Array, se: np.ndarray) -> Array:
    """``cv2.dilate`` on a grayscale uint8 image (max filter, border -inf)."""
    return _gray_reduce(img, se, jnp.maximum).astype(img.dtype)


def erode_gray(img: Array, se: np.ndarray) -> Array:
    """``cv2.erode`` on a grayscale uint8 image (min filter, border +inf)."""
    return _gray_reduce(img, se, jnp.minimum).astype(img.dtype)


def morph_close_gray(img: Array, se: np.ndarray) -> Array:
    """Grayscale MORPH_CLOSE — used by the tracking head on the flow-viz
    gray image before thresholding (optical_flow_ob.py:344-345)."""
    return erode_gray(dilate_gray(img, se), se)


def dilate_erode_n(mask: Array, se: np.ndarray, iterations: int) -> Array:
    """The reference's seg-head smoothing loop: N × (dilate; erode)
    (optical_flow_seg.py:349-352).  Note this equals N × close, not open."""
    for _ in range(iterations):
        mask = morph_close(mask, se)
    return mask
