"""Canny edge detection + contour-box ROI — the `default_ptm` variant.

The reference's earliest ROI gate (codebase/RAFT/default_ptm.py:44-80)
differs from the production `opticalFlow3D` gate: it thresholds the
memristor image at |value−255| ≥ 1 sampled on the cell grid, runs
``cv2.Canny(transition, 128, 256)``, extracts external contours, and
computes per-contour bounding-rect ROIs with a 1-cell extend.

TPU-idiomatic re-creation:

- :func:`canny_edges` — fixed-shape Canny: Sobel-3 gradients, L1
  magnitude (cv2's default ``L2gradient=False``), 4-sector non-maximum
  suppression, and double-threshold hysteresis via bounded
  dilate-and-mask iteration (``lax.while_loop`` on the tiny mem grid).
- :func:`canny_roi_boxes` — connected components of the edge map →
  per-component bounding boxes (equivalent to boundingRects of
  ``cv2.findContours(..., RETR_EXTERNAL)`` on fully-enclosed edge sets),
  scaled by the cell size with the reference's 1-cell EXTEND and border
  clamping.

Edge-map parity vs ``cv2.Canny`` is exact on the blocky mem-grid inputs
this gate sees (tests/test_canny.py checks real scene grids and synthetic
patterns); natural-image parity is not a goal — the reference only ever
feeds binarized transition grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nsof_tpu.ops import components as cc

Array = jnp.ndarray


def _sobel(img: Array) -> tuple[Array, Array]:
    """Sobel-3 gradients with cv2's BORDER_REPLICATE (Canny's default)."""
    x = jnp.pad(img.astype(jnp.float32), 1, mode="edge")
    # gx: [-1 0 1; -2 0 2; -1 0 1], gy: transpose
    gx = (
        (x[:-2, 2:] + 2 * x[1:-1, 2:] + x[2:, 2:])
        - (x[:-2, :-2] + 2 * x[1:-1, :-2] + x[2:, :-2])
    )
    gy = (
        (x[2:, :-2] + 2 * x[2:, 1:-1] + x[2:, 2:])
        - (x[:-2, :-2] + 2 * x[:-2, 1:-1] + x[:-2, 2:])
    )
    return gx, gy


def _nms(mag: Array, gx: Array, gy: Array) -> Array:
    """cv2-style sector NMS: compare against the two neighbours along the
    quantized gradient direction (strict > on one side, >= on the other,
    matching cv2's a>b && a>=c convention)."""
    h, w = mag.shape
    m = jnp.pad(mag, 1)

    def nb(dy, dx):
        return jax.lax.dynamic_slice(m, (1 + dy, 1 + dx), (h, w))

    ax, ay = jnp.abs(gx), jnp.abs(gy)
    # cv2 sector logic (canny.cpp): tg22 = 0.4142, tg67 = 2.4142
    horizontal = ay < ax * 0.4142135623730950488016887242097
    vertical = ay > ax * 2.4142135623730950488016887242097
    sign = (gx * gy) >= 0  # same-sign → 135°/“\” diagonal in image coords

    n1 = jnp.where(
        horizontal, nb(0, -1),
        jnp.where(vertical, nb(-1, 0), jnp.where(sign, nb(-1, -1), nb(-1, 1))),
    )
    n2 = jnp.where(
        horizontal, nb(0, 1),
        jnp.where(vertical, nb(1, 0), jnp.where(sign, nb(1, 1), nb(1, -1))),
    )
    # cv2 canny.cpp: horizontal/vertical compare (>, >=); diagonals use
    # strict > on BOTH neighbours
    keep_hv = (mag > n1) & (mag >= n2)
    keep_diag = (mag > n1) & (mag > n2)
    return jnp.where(horizontal | vertical, keep_hv, keep_diag)


@functools.partial(jax.jit, static_argnames=())
def canny_edges(
    img_u8: Array, low: float = 128.0, high: float = 256.0
) -> Array:
    """cv2.Canny(img, low, high) equivalent (L1 gradient, Sobel-3).

    Returns a bool edge map.  Hysteresis runs 8-connected dilation of the
    strong set masked to the weak set until fixpoint (bounded by the
    pixel count — on the ≤32×32 mem grids this is a handful of sweeps).
    """
    gx, gy = _sobel(img_u8)
    mag = jnp.abs(gx) + jnp.abs(gy)  # L2gradient=False default
    keep = _nms(mag, gx, gy)
    strong = keep & (mag > high)
    weak = keep & (mag > low)

    def dilate8(a):
        p = jnp.pad(a, 1)
        h, w = a.shape
        out = a
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                out = out | jax.lax.dynamic_slice(
                    p, (1 + dy, 1 + dx), (h, w)
                )
        return out

    def cond(state):
        cur, changed = state
        return changed

    def body(state):
        cur, _ = state
        grown = dilate8(cur) & weak
        return grown, (grown != cur).any()

    edges, _ = jax.lax.while_loop(cond, body, (strong, jnp.bool_(True)))
    return edges


def transition_from_mem(
    mem_u8: Array, grid_h: int, grid_w: int, cell_h: int, cell_w: int
) -> Array:
    """default_ptm.py:59-64's transition grid: sample the full-res mem
    image at cell strides; active where |value − 255| ≥ 1."""
    sampled = mem_u8[:: cell_h, :: cell_w][:grid_h, :grid_w]
    return jnp.where(
        jnp.abs(sampled.astype(jnp.int32) - 255) >= 1, 255, 0
    ).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cell_h", "cell_w", "k_max"))
def canny_roi_boxes(
    transition_u8: Array,
    image_h: int,
    image_w: int,
    cell_h: int,
    cell_w: int,
    k_max: int = 8,
) -> dict[str, Array]:
    """Canny → contour bounding boxes → pixel-space ROI with 1-cell
    extend, clamped like the reference's nine border cases
    (default_ptm.py:71-80 and the per-quadrant crops after it).

    Returns ``boxes`` [k_max, 4] (x0, y0, x1, y1) in pixels, ``valid``
    [k_max], ``any_active``.
    """
    edges = canny_edges(transition_u8.astype(jnp.float32))
    # findContours walks 8-connected boundaries; component bboxes of the
    # 8-connected edge sets equal the external contours' boundingRects.
    # RETR_EXTERNAL additionally DROPS contours nested inside another
    # component's holes — emulated by flood-filling the 4-connected
    # background from the border and keeping only components 8-adjacent
    # to that outside region.
    labels = cc.label_components(edges, connectivity=8)

    bg = ~edges
    h, w = edges.shape
    border = jnp.zeros((h, w), bool).at[0, :].set(True).at[-1, :].set(
        True).at[:, 0].set(True).at[:, -1].set(True)
    seed = border & bg

    def grow4(a):
        p = jnp.pad(a, 1)
        out = a
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            out = out | jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w))
        return out & bg

    def body(state):
        cur, _ = state
        grown = grow4(cur)
        return grown, (grown != cur).any()

    outside, _ = jax.lax.while_loop(
        lambda s: s[1], body, (seed, jnp.bool_(True))
    )
    # pixels 8-adjacent to outside (image border counts as outside)
    pad_out = jnp.pad(outside, 1, constant_values=True)
    near_out = jnp.zeros((h, w), bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            near_out = near_out | jax.lax.dynamic_slice(
                pad_out, (1 + dy, 1 + dx), (h, w)
            )
    ext_roots = jnp.unique(
        jnp.where(edges & near_out, labels, jnp.int32(2**30)),
        size=k_max, fill_value=jnp.int32(2**30),
    )

    stats = cc.component_stats(labels, k_max=k_max)
    # stats slots follow sorted unique roots (component_stats); mark the
    # slots whose root is 8-adjacent to the outside background
    big = jnp.int32(2**30)
    uniq = jnp.unique(
        jnp.where(labels < 0, big, labels).ravel(),
        size=k_max, fill_value=big,
    )
    external = jnp.isin(uniq, ext_roots) & (uniq != big)

    bx, by, bw, bh = (stats["boxes"][:, i] for i in range(4))
    # grid-space [x0, y0, x1exc, y1exc] with the 1-cell extend each side
    x0 = bx - 1
    y0 = by - 1
    x1 = bx + bw + 1
    y1 = by + bh + 1
    # pixel space with the reference's w-1/h-1 border clamp
    px0 = jnp.clip(x0 * cell_w, 0, image_w - 1)
    py0 = jnp.clip(y0 * cell_h, 0, image_h - 1)
    px1 = jnp.clip(x1 * cell_w, 0, image_w - 1)
    py1 = jnp.clip(y1 * cell_h, 0, image_h - 1)
    boxes = jnp.stack([px0, py0, px1, py1], axis=-1)
    valid = stats["valid"] & external
    return {
        "boxes": boxes,
        "valid": valid,
        "any_active": valid.any(),
        "edges": edges,
    }
