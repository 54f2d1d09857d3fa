"""Color-space and normalisation ops with OpenCV-matching semantics.

The reference task heads post-process flow with a chain of OpenCV native ops
(optical_flow_seg.py:322-357, optical_flow_ob.py:321-379):
``cartToPolar`` → HSV image → ``HSV2BGR`` → ``BGR2GRAY`` → threshold.  These
are re-implemented here as pure jnp element-wise ops (VPU work under jit),
with integer semantics matched to OpenCV where they matter (fixed-point gray
conversion, saturating uint8 casts).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def cart_to_polar(fx: Array, fy: Array) -> tuple[Array, Array]:
    """Magnitude and angle (radians, [0, 2π)) of a flow field.

    Matches ``cv2.cartToPolar(angleInDegrees=False)`` semantics
    (optical_flow_seg.py:284) up to OpenCV's fastAtan2 approximation
    (~0.3 degrees); we use the exact atan2.
    """
    fx = jnp.asarray(fx, jnp.float32)
    fy = jnp.asarray(fy, jnp.float32)
    mag = jnp.sqrt(fx * fx + fy * fy)
    ang = jnp.arctan2(fy, fx)
    ang = jnp.where(ang < 0, ang + 2.0 * jnp.pi, ang)
    return mag, ang


def normalize_minmax(x: Array, lo: float = 0.0, hi: float = 255.0) -> Array:
    """``cv2.normalize(x, None, lo, hi, cv2.NORM_MINMAX)``.

    Affinely maps [min(x), max(x)] to [lo, hi]; a constant input maps to
    ``lo`` (OpenCV uses scale 0 when the range is degenerate).
    """
    x = jnp.asarray(x, jnp.float32)
    mn = jnp.min(x)
    mx = jnp.max(x)
    scale = jnp.where(mx - mn > 1e-12, (hi - lo) / (mx - mn), 0.0)
    return (x - mn) * scale + lo


def saturate_u8(x: Array) -> Array:
    """OpenCV ``saturate_cast<uchar>``: round-half-to-even then clamp."""
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


def trunc_u8(x: Array) -> Array:
    """C-style truncating cast to uint8 after clamp (numpy ``astype`` on a
    float assigned into a uint8 array truncates toward zero; the reference
    relies on this for the HSV hue/value channels,
    optical_flow_seg.py:331-334)."""
    return jnp.clip(jnp.trunc(x), 0, 255).astype(jnp.uint8)


def flow_to_hsv_u8(mag: Array, ang: Array) -> Array:
    """Build the reference's HSV visualisation image from flow polar coords.

    H = ang*180/π/2 (uint8 truncation), S = 255, V = minmax-normalised
    magnitude (optical_flow_seg.py:327-334).
    """
    h = trunc_u8(ang * 180.0 / jnp.pi / 2.0)
    s = jnp.full(mag.shape, 255, jnp.uint8)
    v = trunc_u8(normalize_minmax(mag, 0.0, 255.0))
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_bgr_u8(hsv: Array) -> Array:
    """OpenCV ``cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)`` for uint8 input.

    H in [0, 180) maps to 6 sectors of 30; S, V in [0, 255].
    """
    h = hsv[..., 0].astype(jnp.float32)
    s = hsv[..., 1].astype(jnp.float32) / 255.0
    v = hsv[..., 2].astype(jnp.float32)

    sector_f = h / 30.0
    sector = jnp.floor(sector_f)
    f = sector_f - sector
    sector = sector.astype(jnp.int32) % 6

    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))

    # sector → (r, g, b) selection
    r = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [v, q, p, p, t], default=v)
    g = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [t, v, v, q, p], default=p)
    b = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [p, p, t, v, v], default=q)
    return jnp.stack([saturate_u8(b), saturate_u8(g), saturate_u8(r)], axis=-1)


def bgr_to_gray_u8(bgr: Array) -> Array:
    """OpenCV ``cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)`` with the exact
    fixed-point weights (OpenCV ≥5: 15-bit):
    (R*9798 + G*19235 + B*3735 + 2^14) >> 15."""
    b = bgr[..., 0].astype(jnp.int32)
    g = bgr[..., 1].astype(jnp.int32)
    r = bgr[..., 2].astype(jnp.int32)
    y = (r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15
    return y.astype(jnp.uint8)


def rgb_to_gray_u8(rgb: Array) -> Array:
    """``cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)``: same weights, channel 0
    treated as R.  The reference applies this to BGR-loaded frames
    (optical_flow_seg.py:442-443), effectively swapping the R/B weights —
    call this on BGR data to reproduce that behaviour exactly."""
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    y = (r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15
    return y.astype(jnp.uint8)


def threshold_binary(x: Array, thresh: float, maxval: float = 255.0) -> Array:
    """``cv2.threshold(x, thresh, maxval, cv2.THRESH_BINARY)``: strictly
    greater-than comparison.  maxval saturates to the uint8 range (the
    reference passes 256, which OpenCV saturates to 255,
    optical_flow_seg.py:448)."""
    mv = min(int(maxval), 255)
    return jnp.where(x > thresh, mv, 0).astype(jnp.uint8)
