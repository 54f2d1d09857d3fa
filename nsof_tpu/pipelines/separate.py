"""FLAG=1 separate-regions pipelines (``process_separate_regions``).

The reference's FLAG=1 mode computes one Farnebäck call per active device
component, writing each region's flow into the shared field with overwrite
semantics (optical_flow_seg.py:123-166, ``flow[y0:y1, x0:x1] =
current_flow``), then runs the task head either on the PADDING-extended
union of the regions (MERGE_FLAG=True — the configuration of every bundled
FLAG=1 dataset: autodriving/uav/uavnew2 Parameters.txt) or per region
(MERGE_FLAG=False, optical_flow_seg.py:273-299).

TPU shape discipline: every region uses the same static window
(``cfg.sep_win_shape``); the k_max component slots are walked with a
``lax.fori_loop`` whose body contains ONE traced Farnebäck program and a
``lax.cond`` that skips inactive slots at runtime.  Slot order follows the
on-device connected-components labelling, which may differ from cv2's
row-major discovery order — overwrite results differ from the reference
only where two EXTEND-padded regions overlap with conflicting flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nsof_tpu.config import PipelineConfig
from nsof_tpu.ops import roi as roi_ops
from nsof_tpu.ops.farneback import farneback
from nsof_tpu.pipelines.prediction import warp_region
from nsof_tpu.pipelines.segmentation import seg_head_window
from nsof_tpu.pipelines.tracking import tracking_head_window

Array = jnp.ndarray


def union_box(boxes: Array, valid: Array, padding: int, image_h, image_w):
    """PADDING-extended union of the valid region boxes (the MERGE_FLAG
    head's area, optical_flow_seg.py:273-277)."""
    big = jnp.int32(2**30)
    x0 = jnp.min(jnp.where(valid, boxes[:, 0], big)) - padding
    y0 = jnp.min(jnp.where(valid, boxes[:, 1], big)) - padding
    x1 = jnp.max(jnp.where(valid, boxes[:, 2], -big)) + padding
    y1 = jnp.max(jnp.where(valid, boxes[:, 3], -big)) + padding
    x0 = jnp.clip(x0, 0, image_w)
    y0 = jnp.clip(y0, 0, image_h)
    x1 = jnp.clip(x1, 0, image_w)
    y1 = jnp.clip(y1, 0, image_h)
    return jnp.where(
        jnp.any(valid),
        jnp.stack([x0, y0, x1, y1]),
        jnp.zeros(4, jnp.int32),
    )


def separate_flow_field(
    mem_u8: Array, prev_gray: Array, next_gray: Array, cfg: PipelineConfig
) -> dict[str, Array]:
    """Per-component ROI-gated flow, assembled into a full-res field.

    Returns ``flow`` [H, W, 2] in cv2 sign convention (callers negate, as
    the reference does after opticalFlow3D, optical_flow_seg.py:461),
    per-slot ``boxes``/``valid``/``region_pcts``, the MERGE-head
    ``union`` box, and ``any_active``.
    """
    h, w = cfg.image_h, cfg.image_w
    swh, sww = cfg.sep_win_shape
    r = roi_ops.roi_boxes(mem_u8, h, w, cfg.roi)
    boxes = r["boxes"]
    valid = r["valid"]

    def body(k, flow):
        box = boxes[k]

        def compute(f):
            origin = roi_ops.window_origin(box, swh, sww, h, w)
            p = roi_ops.crop_window(prev_gray, origin, swh, sww)
            n = roi_ops.crop_window(next_gray, origin, swh, sww)
            fw = farneback(p, n, cfg.fb)
            inb = roi_ops.window_box_mask(box, origin, swh, sww)
            fw = jnp.where(inb[..., None], fw, 0.0)
            return roi_ops.scatter_window(f, fw, box, origin)

        return jax.lax.cond(valid[k], compute, lambda f: f, flow)

    flow = jax.lax.fori_loop(
        0, cfg.roi.k_max, body, jnp.zeros((h, w, 2), jnp.float32)
    )
    pcts = jax.vmap(
        lambda b: roi_ops.region_percentage(b, h, w)
    )(boxes) * valid
    return {
        "flow": flow,
        "boxes": boxes,
        "valid": valid,
        "region_pcts": pcts,
        "union": union_box(boxes, valid, cfg.roi.padding, h, w),
        "any_active": r["any_active"],
    }


@functools.partial(jax.jit, static_argnames=("cfg", "merge_head"))
def seg_step_separate(
    mem_u8: Array,
    prev_gray: Array,
    next_gray: Array,
    cfg: PipelineConfig,
    merge_head: bool = True,
) -> dict[str, Array]:
    """FLAG=1 motion segmentation.

    ``merge_head=True`` runs the seg head once on the PADDING-extended
    union region (MERGE_FLAG=True, optical_flow_seg.py:271-288);
    ``False`` runs it per region with overwrite combination (:289-299).
    """
    h, w = cfg.image_h, cfg.image_w
    ff = separate_flow_field(mem_u8, prev_gray, next_gray, cfg)
    flow = -ff["flow"]  # Farnebäck inversion (optical_flow_seg.py:461)
    active = ff["any_active"]
    mask = jnp.zeros((h, w), jnp.uint8)

    if merge_head:
        wh, ww = cfg.win_shape
        ub = ff["union"]
        origin = roi_ops.window_origin(ub, wh, ww, h, w)
        flow_win = roi_ops.crop_window(flow, origin, wh, ww)
        inbox = roi_ops.window_box_mask(ub, origin, wh, ww) & active
        mask_win = seg_head_window(
            jnp.where(inbox[..., None], flow_win, 0.0), inbox, cfg
        )
        mask = roi_ops.scatter_window(mask, mask_win, ub, origin)
    else:
        swh, sww = cfg.sep_win_shape
        boxes, valid = ff["boxes"], ff["valid"]

        def body(k, m):
            box = boxes[k]

            def compute(m):
                origin = roi_ops.window_origin(box, swh, sww, h, w)
                flow_win = roi_ops.crop_window(flow, origin, swh, sww)
                inbox = roi_ops.window_box_mask(box, origin, swh, sww)
                mask_win = seg_head_window(
                    jnp.where(inbox[..., None], flow_win, 0.0), inbox, cfg
                )
                return roi_ops.scatter_window(m, mask_win, box, origin)

            return jax.lax.cond(valid[k], compute, lambda m: m, m)

        mask = jax.lax.fori_loop(0, cfg.roi.k_max, body, mask)

    return {
        "mask": mask,
        "flow": flow,
        "boxes": ff["boxes"],
        "valid": ff["valid"],
        "box": ff["union"],
        "any_active": active,
        "region_pct": jnp.sum(ff["region_pcts"]),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def tracking_step_separate(
    mem_u8: Array, prev_gray: Array, next_gray: Array, cfg: PipelineConfig
) -> dict[str, Array]:
    """FLAG=1 tracking with the MERGE_FLAG=True head (the configuration
    of every bundled FLAG=1 dataset; optical_flow_ob.py:404-419)."""
    h, w = cfg.image_h, cfg.image_w
    wh, ww = cfg.win_shape
    ff = separate_flow_field(mem_u8, prev_gray, next_gray, cfg)
    flow = -ff["flow"]
    active = ff["any_active"]
    ub = ff["union"]
    origin = roi_ops.window_origin(ub, wh, ww, h, w)
    flow_win = roi_ops.crop_window(flow, origin, wh, ww)
    inbox = roi_ops.window_box_mask(ub, origin, wh, ww) & active
    out = tracking_head_window(
        jnp.where(inbox[..., None], flow_win, 0.0), inbox, origin, cfg
    )
    out["valid"] = out["valid"] & active
    out["box"] = ub
    out["any_active"] = active
    out["region_pct"] = jnp.sum(ff["region_pcts"])
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def prediction_step_separate(
    mem_u8: Array,
    prev_gray: Array,
    next_gray: Array,
    next_frame: Array,
    cfg: PipelineConfig,
) -> dict[str, Array]:
    """FLAG=1 prediction with the MERGE_FLAG=True head: warp the union
    region of the assembled flow (optical_flow_prediction.py:276-300)."""
    h, w = cfg.image_h, cfg.image_w
    ff = separate_flow_field(mem_u8, prev_gray, next_gray, cfg)
    flow = -ff["flow"]
    active = ff["any_active"]
    ub = jnp.where(active, ff["union"], jnp.zeros(4, jnp.int32))
    pred = warp_region(next_frame, flow, ub)
    return {
        "pred": pred,
        "flow": flow,
        "box": ub,
        "any_active": active,
        "region_pct": jnp.sum(ff["region_pcts"]),
    }
