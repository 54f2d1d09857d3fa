"""Optical-flow color coding (Middlebury / Baker et al. color wheel).

jnp re-implementation of the standard flow visualisation the reference
vendors as ``flow_viz.py`` (make_colorwheel :20-67, flow_uv_to_colors
:70-106, flow_to_image :109-135): a 55-color wheel over six hue transitions
(RY=15, YG=6, GC=4, CB=11, BM=13, MR=6), flow normalised by the maximum
radius, angle → wheel position, saturation scaled by radius.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@functools.lru_cache(maxsize=1)
def make_colorwheel() -> np.ndarray:
    """[55, 3] uint8-valued float color wheel (RGB)."""
    transitions = [("RY", 15), ("YG", 6), ("GC", 4), ("CB", 11), ("BM", 13),
                   ("MR", 6)]
    ncols = sum(n for _, n in transitions)
    wheel = np.zeros((ncols, 3))
    col = 0
    for name, n in transitions:
        ramp = np.arange(n) / n
        if name == "RY":
            wheel[col : col + n, 0] = 255
            wheel[col : col + n, 1] = np.floor(255 * ramp)
        elif name == "YG":
            wheel[col : col + n, 0] = 255 - np.floor(255 * ramp)
            wheel[col : col + n, 1] = 255
        elif name == "GC":
            wheel[col : col + n, 1] = 255
            wheel[col : col + n, 2] = np.floor(255 * ramp)
        elif name == "CB":
            wheel[col : col + n, 1] = 255 - np.floor(255 * ramp)
            wheel[col : col + n, 2] = 255
        elif name == "BM":
            wheel[col : col + n, 2] = 255
            wheel[col : col + n, 0] = np.floor(255 * ramp)
        else:  # MR
            wheel[col : col + n, 2] = 255 - np.floor(255 * ramp)
            wheel[col : col + n, 0] = 255
        col += n
    return wheel


def flow_to_image(flow_uv: Array, clip_flow: float | None = None,
                  convert_to_bgr: bool = False) -> Array:
    """Flow [H, W, 2] → uint8 color image [H, W, 3].

    Radius-normalises by the max magnitude then colors by angle; unsaturated
    outside the unit radius (factor 0.75 on overshoot), matching the
    Middlebury convention used by the reference's ``flow_to_image``.
    """
    u = jnp.asarray(flow_uv[..., 0], jnp.float32)
    v = jnp.asarray(flow_uv[..., 1], jnp.float32)
    if clip_flow is not None:
        u = jnp.clip(u, 0, clip_flow)
        v = jnp.clip(v, 0, clip_flow)
    rad_max = jnp.maximum(jnp.sqrt(u * u + v * v).max(), 1e-5)
    u = u / rad_max
    v = v / rad_max

    wheel = jnp.asarray(make_colorwheel(), jnp.float32)
    ncols = wheel.shape[0]
    rad = jnp.sqrt(u * u + v * v)
    a = jnp.arctan2(-v, -u) / jnp.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = jnp.floor(fk).astype(jnp.int32)
    k1 = (k0 + 1) % ncols
    f = fk - k0

    cols = []
    for ch in range(3):
        col0 = wheel[k0, ch] / 255.0
        col1 = wheel[k1, ch] / 255.0
        col = (1 - f) * col0 + f * col1
        col = jnp.where(rad <= 1, 1 - rad * (1 - col), col * 0.75)
        cols.append(jnp.floor(255.0 * col))
    # channel order: RGB, or BGR on request (reference default writes BGR)
    img = jnp.stack(cols, axis=-1)
    if convert_to_bgr:
        img = img[..., ::-1]
    return img.astype(jnp.uint8)
