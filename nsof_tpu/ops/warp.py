"""Bilinear remap / flow warping (the TPU equivalent of ``cv2.remap``).

The prediction pipeline warps the next frame by the flow field to synthesise
the future frame (optical_flow_prediction.py:281-300: ``flow_map = grid +
flow`` then per-channel ``cv2.remap(..., INTER_LINEAR, BORDER_REPLICATE)``).
Here the remap is a vectorised gather with clamped (replicate) coordinates —
one fused XLA op, all channels at once.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def remap_bilinear(img: Array, map_x: Array, map_y: Array) -> Array:
    """Sample ``img`` at (map_x, map_y) with bilinear interpolation and
    replicate borders.

    Args:
        img: [H, W] or [H, W, C] source image.
        map_x/map_y: [h, w] float sample coordinates (x = column, y = row).

    Returns [h, w] or [h, w, C] with img's dtype (rounded for integer types).

    Matches ``cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR,
    borderMode=cv2.BORDER_REPLICATE)`` up to OpenCV's 5-bit fixed-point
    fraction quantisation (≤1/32 px coordinate error).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w = img.shape[:2]
    x = jnp.asarray(map_x, jnp.float32)
    y = jnp.asarray(map_y, jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def clampx(v):
        return jnp.clip(v.astype(jnp.int32), 0, w - 1)

    def clampy(v):
        return jnp.clip(v.astype(jnp.int32), 0, h - 1)

    x0i, x1i = clampx(x0), clampx(x0 + 1)
    y0i, y1i = clampy(y0), clampy(y0 + 1)

    imgf = img.astype(jnp.float32)
    v00 = imgf[y0i, x0i]
    v01 = imgf[y0i, x1i]
    v10 = imgf[y1i, x0i]
    v11 = imgf[y1i, x1i]
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    else:
        out = out.astype(img.dtype)
    if squeeze:
        out = out[..., 0]
    return out


def warp_by_flow(img: Array, flow: Array) -> Array:
    """Warp ``img`` by sampling at ``grid + flow`` (the prediction head's
    ``flow_map``, optical_flow_prediction.py:287-289)."""
    h, w = flow.shape[:2]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + flow[..., 0]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + flow[..., 1]
    return remap_bilinear(img, xs, ys)
