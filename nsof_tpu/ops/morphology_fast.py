"""Batched binary morphology in batch-in-lanes layout ([H, W, B]).

The exact-parity ops in :mod:`nsof_tpu.ops.morphology` correlate the full
SE (a 10×10 ellipse = 100-tap conv) per image; under vmap that lowers to
single-channel convs — poor lane utilisation and the dominant cost of the
batched segmentation head.  Here morphology is decomposed exactly:

- dilation by an arbitrary SE = max over SE rows of a *horizontal window
  max* of the row's run, shifted vertically — the ellipse's rows are
  solid runs, so this is exact, not an approximation;
- each horizontal window max uses log₂ shift-doubling (two staggered
  power-of-two windows), ~log₂(k)+1 elementwise ops instead of k taps;
- erosion is dilation of the complement (exact for the symmetric border
  conventions used here: dilate pads background, erode pads foreground).

All ops are elementwise on [H, W, B] with B on lanes — VPU-perfect.
Bit-equality with the cv2-parity ops is covered by tests.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from nsof_tpu.ops.morphology import ellipse_se

Array = jnp.ndarray


def se_row_runs(se: np.ndarray) -> list[tuple[int, int, int]]:
    """(dy, left_extent, right_extent) for each nonempty SE row; offsets
    relative to the anchor (ksize//2).  Requires each row to be one solid
    run (holds for cv2 elliptical SEs)."""
    kh, kw = se.shape
    ay, ax = kh // 2, kw // 2
    runs = []
    for i in range(kh):
        cols = np.nonzero(se[i])[0]
        if cols.size == 0:
            continue
        assert (np.diff(cols) == 1).all(), "SE row is not a solid run"
        runs.append((i - ay, int(cols[0] - ax), int(cols[-1] - ax)))
    return runs


def _shift_h(x: Array, dy: int, fill: bool) -> Array:
    """Shift along H so out[i] = x[i + dy], padding with ``fill``."""
    if dy == 0:
        return x
    h = x.shape[0]
    pad = ((max(0, -dy), max(0, dy)),) + ((0, 0),) * (x.ndim - 1)
    xp = jnp.pad(x, pad, constant_values=fill)
    return xp[max(0, dy) : max(0, dy) + h]


def _shift_w(x: Array, dx: int, fill: bool) -> Array:
    if dx == 0:
        return x
    w = x.shape[1]
    pad = ((0, 0), (max(0, -dx), max(0, dx))) + ((0, 0),) * (x.ndim - 2)
    xp = jnp.pad(x, pad, constant_values=fill)
    return xp[:, max(0, dx) : max(0, dx) + w]


def _window_or_w(x: Array, left: int, right: int) -> Array:
    """out[i] = OR of x[i+left .. i+right] along W via shift doubling
    (left ≤ right are signed offsets; out-of-image reads are False)."""
    k = right - left + 1
    if k == 1:
        return _shift_w(x, left, False)
    w = x.shape[1]
    lp = max(0, -left)
    xp = jnp.pad(
        x, ((0, 0), (lp, max(0, right))) + ((0, 0),) * (x.ndim - 2),
        constant_values=False,
    )
    # forward window F[i] = OR xp[i .. i+k-1], built by shift doubling
    f = xp
    span = 1
    while span * 2 <= k:
        f = f | _shift_w(f, span, False)
        span *= 2
    if span < k:
        f = f | _shift_w(f, k - span, False)
    # out[i] = window at original column i = F[lp + i + left]
    start = lp + left
    return f[:, start : start + w]


def _or_over_se(x: Array, se: np.ndarray) -> Array:
    """OR over SE offsets: out(p) = OR_{k∈SE} x(p + k − anchor) — the
    shared machinery of both ops (cv2 correlates the unflipped SE with
    anchor ksize//2 for dilate AND erode; verified empirically)."""
    out = None
    by_run: dict[tuple[int, int], list[int]] = {}
    for dy, left, right in se_row_runs(se):
        by_run.setdefault((left, right), []).append(dy)
    for (left, right), dys in by_run.items():
        row = _window_or_w(x, left, right)
        for dy in dys:
            shifted = _shift_h(row, dy, False)
            out = shifted if out is None else (out | shifted)
    return out


def dilate_binary_hwb(mask: Array, se: np.ndarray) -> Array:
    """Binary dilation of [H, W, B] boolean masks (cv2.dilate parity on
    each batch slice; padding = background)."""
    return _or_over_se(mask.astype(bool), se)


def erode_binary_hwb(mask: Array, se: np.ndarray) -> Array:
    """Binary erosion: min over the same offsets = ¬ OR over ¬x; the
    complement's zero padding realises cv2.erode's +inf border."""
    return ~_or_over_se(~mask.astype(bool), se)


def dilate_erode_n_hwb(mask: Array, se: np.ndarray, iterations: int) -> Array:
    """N × (dilate; erode) — the seg-head smoothing loop, batched."""
    x = mask.astype(bool)
    for _ in range(iterations):
        x = erode_binary_hwb(dilate_binary_hwb(x, se), se)
    return x
