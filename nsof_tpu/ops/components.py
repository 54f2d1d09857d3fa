"""On-device connected components, component statistics, and NMS.

TPU-native replacement for the OpenCV native ops used throughout the
reference: ``cv2.connectedComponentsWithStats`` (optical_flow_seg.py:223),
``cv2.findContours`` + ``boundingRect`` (optical_flow_ob.py:349-356), and
``py_cpu_nms`` (optical_flow_ob.py:96-135).

Labelling uses iterative minimum-label propagation accelerated by segmented
min-scans along rows and columns (``lax.associative_scan``), inside a
``lax.while_loop`` that runs to fixpoint — static shapes, no host sync.  On
the tiny memristor grids (≤24×16) this converges in 1–2 sweeps; on full
image-resolution masks it needs one sweep per "turn" of the most serpentine
component, each sweep O(HW log W).

Component ids are *min linear index* roots, so ordering differs from
OpenCV's two-pass labelling — downstream consumers (bounding boxes, areas)
are order-independent.  Areas are pixel counts; note ``cv2.contourArea``
(used by the tracking head's 500 px² filter) measures the contour polygon
and is slightly smaller for the same blob — divergence documented in
:mod:`nsof_tpu.pipelines.tracking`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_BIG = 2**30  # sentinel label for background / empty slots


def _seg_min_scan(vals: Array, resets: Array, axis: int, reverse: bool) -> Array:
    """Segmented running-min along ``axis``; ``resets`` starts new segments."""

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    v, _ = jax.lax.associative_scan(
        combine, (vals, resets), axis=axis, reverse=reverse
    )
    return v


@partial(jax.jit, static_argnames=("connectivity", "max_sweeps"))
def label_components(
    mask: Array, connectivity: int = 4, max_sweeps: int = 256
) -> Array:
    """Label connected components of a boolean mask.

    Returns int32 labels: background = -1, each component labelled by the
    minimum linear index (row-major) of its pixels.

    Args:
        mask: [H, W] boolean (or {0,255}) activity mask.
        connectivity: 4 or 8 (``CONNECT`` in the reference, seg.py:44).
        max_sweeps: safety bound on while_loop sweeps.
    """
    mask = jnp.asarray(mask) > 0
    h, w = mask.shape
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    labels0 = jnp.where(mask, lin, _BIG)
    resets = ~mask

    def neighbor_min(lab):
        out = lab
        shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
        if connectivity == 8:
            shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
        for dy, dx in shifts:
            sh = jnp.roll(lab, (dy, dx), axis=(0, 1))
            # roll wraps; invalidate wrapped rows/cols
            if dy == -1:
                sh = sh.at[-1, :].set(_BIG)
            elif dy == 1:
                sh = sh.at[0, :].set(_BIG)
            if dx == -1:
                sh = sh.at[:, -1].set(_BIG)
            elif dx == 1:
                sh = sh.at[:, 0].set(_BIG)
            out = jnp.minimum(out, sh)
        return jnp.where(mask, out, _BIG)

    def sweep(lab):
        lab = neighbor_min(lab)
        lab = _seg_min_scan(lab, resets, axis=1, reverse=False)
        lab = _seg_min_scan(lab, resets, axis=1, reverse=True)
        lab = _seg_min_scan(lab, resets, axis=0, reverse=False)
        lab = _seg_min_scan(lab, resets, axis=0, reverse=True)
        return jnp.where(mask, lab, _BIG)

    def cond(state):
        i, lab, prev_changed = state
        return (i < max_sweeps) & prev_changed

    def body(state):
        i, lab, _ = state
        new = sweep(lab)
        return i + 1, new, jnp.any(new != lab)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels0, jnp.bool_(True))
    )
    return jnp.where(mask, labels, -1)


@partial(jax.jit, static_argnames=("k_max",))
def component_stats(labels: Array, k_max: int = 16) -> dict[str, Array]:
    """Per-component bounding boxes and areas (static ``k_max`` slots).

    The TPU analogue of ``cv2.connectedComponentsWithStats`` stats rows
    [LEFT, TOP, WIDTH, HEIGHT, AREA] minus the background row.

    Returns dict with ``boxes`` [k_max, 4] int32 (x, y, w, h), ``areas``
    [k_max] int32, ``valid`` [k_max] bool, ``count`` scalar int32.
    Components beyond ``k_max`` (by ascending root id) are dropped.
    """
    h, w = labels.shape
    flat = jnp.where(labels < 0, _BIG, labels).ravel()
    uniq = jnp.unique(flat, size=k_max, fill_value=_BIG)
    valid = uniq != _BIG
    seg = jnp.searchsorted(uniq, flat)
    seg = jnp.minimum(seg, k_max)  # background / overflow → dump segment

    ys = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)).ravel()
    xs = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)).ravel()
    ns = k_max + 1
    x0 = jax.ops.segment_min(xs, seg, num_segments=ns)[:k_max]
    y0 = jax.ops.segment_min(ys, seg, num_segments=ns)[:k_max]
    x1 = jax.ops.segment_max(xs, seg, num_segments=ns)[:k_max]
    y1 = jax.ops.segment_max(ys, seg, num_segments=ns)[:k_max]
    areas = jax.ops.segment_sum(
        jnp.ones_like(xs), seg, num_segments=ns
    )[:k_max]

    boxes = jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1], axis=-1)
    boxes = jnp.where(valid[:, None], boxes, 0)
    return {
        "boxes": boxes.astype(jnp.int32),
        "areas": jnp.where(valid, areas, 0).astype(jnp.int32),
        "valid": valid,
        "count": valid.sum().astype(jnp.int32),
    }


def connected_components_with_stats(
    mask: Array, connectivity: int = 4, k_max: int = 16
) -> dict[str, Array]:
    """Label + stats in one call (cv2.connectedComponentsWithStats parity,
    minus label-image ordering)."""
    labels = label_components(mask, connectivity)
    out = component_stats(labels, k_max)
    out["labels"] = labels
    return out


def nms(
    boxes: Array,
    scores: Array,
    valid: Array,
    iou_thresh: float,
    plus_one: bool = True,
) -> Array:
    """Greedy non-maximum suppression with the reference's +1 area
    convention (py_cpu_nms, optical_flow_ob.py:96-135).

    Args:
        boxes: [N, 4] (x1, y1, x2, y2) float.
        scores: [N] float (the tracking head uses component area).
        valid: [N] bool, candidate mask.
        iou_thresh: suppress boxes with IoU > thresh against a kept box.
        plus_one: use the reference's inclusive (+1) widths/areas; pass
            False for standard exclusive IoU (the YOLO post step).

    Returns [N] bool keep mask.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    n = boxes.shape[0]
    one = 1.0 if plus_one else 0.0
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (y2 - y1 + one) * (x2 - x1 + one)

    def body(_, state):
        alive, keep = state
        masked = jnp.where(alive, scores, -jnp.inf)
        i = jnp.argmax(masked)
        any_alive = jnp.any(alive)
        keep = keep.at[i].set(jnp.where(any_alive, True, keep[i]))
        xx1 = jnp.maximum(x1[i], x1)
        yy1 = jnp.maximum(y1[i], y1)
        xx2 = jnp.minimum(x2[i], x2)
        yy2 = jnp.minimum(y2[i], y2)
        ww = jnp.maximum(0.0, xx2 - xx1 + one)
        hh = jnp.maximum(0.0, yy2 - yy1 + one)
        inter = ww * hh
        iou = inter / (areas[i] + areas - inter)
        suppress = (iou > iou_thresh) | (jnp.arange(n) == i)
        alive = jnp.where(any_alive, alive & ~suppress, alive)
        return alive, keep

    alive0 = jnp.asarray(valid, bool)
    keep0 = jnp.zeros(n, bool)
    _, keep = jax.lax.fori_loop(0, n, body, (alive0, keep0))
    return keep


def box_iou(box_a: Array, box_b: Array) -> Array:
    """IoU of two (x1, y1, x2, y2) boxes, exclusive coordinates (the metric
    used for tracking accuracy, optical_flow_ob.py:589-609)."""
    xa = jnp.maximum(box_a[0], box_b[0])
    ya = jnp.maximum(box_a[1], box_b[1])
    xb = jnp.minimum(box_a[2], box_b[2])
    yb = jnp.minimum(box_a[3], box_b[3])
    inter = jnp.maximum(0.0, xb - xa) * jnp.maximum(0.0, yb - ya)
    area_a = (box_a[2] - box_a[0]) * (box_a[3] - box_a[1])
    area_b = (box_b[2] - box_b[0]) * (box_b[3] - box_b[1])
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)
