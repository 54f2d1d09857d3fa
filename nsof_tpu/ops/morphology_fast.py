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

import jax
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


# ---------------------------------------------------------------------------
# Bit-packed variant: 32 columns per uint32 word.
#
# Every op above is elementwise OR/AND/NOT plus spatial shifts, so packing
# the W axis into uint32 words cuts the touched data 32× (bool masks live
# as one int8 lane-element each).  W shifts become funnel shifts across
# word boundaries (2 word-shifts + 2 bit-shifts + OR); H shifts are
# unchanged.  Bit j of word i = column 32·i + j.  Invariant maintained by
# every helper: bits beyond the true image width are ALWAYS 0 (so erosion
# via complement uses ``_pnot``, which re-zeros them).
# ---------------------------------------------------------------------------


def _pack_w(x: Array, w_true: int) -> Array:
    """[H, W, B] bool (W a multiple of 32 after internal padding) →
    [H, W/32, B] uint32; tail bits (cols ≥ w_true) forced to 0."""
    h, w, b = x.shape
    wp = -(-w // 32) * 32
    if wp != w:
        x = jnp.pad(x, ((0, 0), (0, wp - w), (0, 0)))
    xr = x.reshape(h, wp // 32, 32, b).astype(jnp.uint32)
    bits = xr << jnp.arange(32, dtype=jnp.uint32)[None, None, :, None]
    words = jax.lax.reduce(
        bits, jnp.uint32(0), jax.lax.bitwise_or, (2,)
    )
    return words & _tail_mask(wp // 32, w_true)


def _tail_mask(n_words: int, w_true: int) -> np.ndarray:
    m = np.full((1, n_words, 1), 0xFFFFFFFF, np.uint32)
    full, rem = divmod(w_true, 32)
    if full < n_words:
        m[0, full, 0] = (1 << rem) - 1 if rem else 0
        m[0, full + 1 :, 0] = 0
    return m


def _pnot(x: Array, w_true: int) -> Array:
    """Complement that preserves the tail-bits-are-0 invariant."""
    return (~x) & _tail_mask(x.shape[1], w_true)


def _unpack_w(words: Array, w_true: int) -> Array:
    h, nw, b = words.shape
    bits = (
        words[:, :, None, :]
        >> jnp.arange(32, dtype=jnp.uint32)[None, None, :, None]
    ) & jnp.uint32(1)
    return bits.reshape(h, nw * 32, b)[:, :w_true].astype(bool)


def _shift_w_packed(x: Array, s: int) -> Array:
    """out[col] = in[col + s] with zero (background) fill."""
    if s == 0:
        return x
    q, r = divmod(s, 32)  # floor division: uniform for negative s

    def wshift(p, dq):
        if dq == 0:
            return p
        n = p.shape[1]
        pad = ((0, 0), (max(0, -dq), max(0, dq)), (0, 0))
        return jnp.pad(p, pad)[:, max(0, dq) : max(0, dq) + n]

    if r == 0:
        return wshift(x, q)
    lo = wshift(x, q) >> jnp.uint32(r)
    hi = wshift(x, q + 1) << jnp.uint32(32 - r)
    return lo | hi


def _window_or_w_packed(x: Array, left: int, right: int) -> Array:
    """OR of columns [i+left .. i+right] via shift doubling, packed.

    The forward window F[i] = OR x[i..i+k−1] must exist at virtual
    columns down to ``left`` < 0, so the word array is pre-extended on
    the left (zero words) and re-aligned after the final shift."""
    k = right - left + 1
    if k == 1:
        return _shift_w_packed(x, left)
    padw = -(-max(0, -left) // 32)
    f = jnp.pad(x, ((0, 0), (padw, 0), (0, 0)))
    span = 1
    while span * 2 <= k:
        f = f | _shift_w_packed(f, span)
        span *= 2
    if span < k:
        f = f | _shift_w_packed(f, k - span)
    return _shift_w_packed(f, left)[:, padw:]


def _or_over_se_packed(x: Array, se: np.ndarray) -> Array:
    out = None
    by_run: dict[tuple[int, int], list[int]] = {}
    for dy, left, right in se_row_runs(se):
        by_run.setdefault((left, right), []).append(dy)
    for (left, right), dys in by_run.items():
        row = _window_or_w_packed(x, left, right)
        for dy in dys:
            shifted = _shift_h(row, dy, False)
            out = shifted if out is None else (out | shifted)
    return out


def dilate_erode_n_masked_hwb(
    mask: Array, inbox: Array, se: np.ndarray, iterations: int
) -> Array:
    """N × (dilate ∘ erode) with the seg head's crop-border re-masking,
    entirely in the packed domain: x = dilate(x ∧ ib); x = erode(x ∨ ¬ib)
    per iteration, then x ∧ ib — bit-identical to the unpacked chain
    in :func:`nsof_tpu.pipelines.segmentation.seg_head_window_batch`."""
    h, w, b = mask.shape
    xp = _pack_w(mask.astype(bool), w)
    ibp = _pack_w(inbox.astype(bool), w)
    for _ in range(iterations):
        xp = _or_over_se_packed(xp & ibp, se)  # dilate(x ∧ ib)
        # erode(y) = ¬ dilO(¬y);  ¬(x ∨ ¬ib) = ¬x ∧ ib
        xp = _pnot(_or_over_se_packed(_pnot(xp, w) & ibp, se), w)
    return _unpack_w(xp & ibp, w)
