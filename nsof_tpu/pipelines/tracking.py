"""Object-tracking pipeline (``optical_flow_ob.py``), fully on-device.

Head: flow polar → reference HSV visualisation → BGR → gray → MORPH_CLOSE
(3×3 ellipse) → threshold at SEG_TH → connected components → bounding boxes
with area ≥ 500 → NMS at IoU 0.2, scored by area
(process_flow_region_tracking, optical_flow_ob.py:321-379).  Static-shape:
boxes live in ``max_boxes`` slots with a validity mask.

Documented divergence: the reference filters by ``cv2.contourArea`` (polygon
area of the outer contour) while we use the component pixel count; for solid
blobs the contour area is smaller by roughly half the perimeter, so blobs
within ~perimeter/2 of the 500 px² cutoff can be filtered differently.

Metric: mean IoU of predicted boxes against the largest GT-mask bounding box
with the reference's +1 pixel convention (optical_flow_ob.py:589-609).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nsof_tpu.config import PipelineConfig
from nsof_tpu.ops import colorspace as cs
from nsof_tpu.ops import components as comp
from nsof_tpu.ops import morphology as morph
from nsof_tpu.ops import roi as roi_ops
from nsof_tpu.ops.farneback import farneback

Array = jnp.ndarray


def flow_gray_window(flow_win: Array, inbox: Array) -> Array:
    """The reference's flow→gray chain on a masked window: HSV (hue from
    angle, value = minmax-normalised magnitude over the region) → BGR →
    gray (optical_flow_ob.py:333-341)."""
    mag, ang = cs.cart_to_polar(flow_win[..., 0], flow_win[..., 1])
    big = jnp.float32(3.4e38)
    mn = jnp.min(jnp.where(inbox, mag, big))
    mx = jnp.max(jnp.where(inbox, mag, -big))
    scale = jnp.where(mx - mn > 1e-12, 255.0 / (mx - mn), 0.0)
    val = (mag - mn) * scale
    hsv = jnp.stack(
        [
            cs.trunc_u8(ang * 180.0 / jnp.pi / 2.0),
            jnp.full(mag.shape, 255, jnp.uint8),
            cs.trunc_u8(val),
        ],
        axis=-1,
    )
    gray = cs.bgr_to_gray_u8(cs.hsv_to_bgr_u8(hsv))
    return jnp.where(inbox, gray, 0).astype(jnp.uint8)


def tracking_head_window(
    flow_win: Array, inbox: Array, origin_yx, cfg: PipelineConfig
) -> dict[str, Array]:
    """Gray → close → threshold → components → area filter → NMS.

    Returns ``boxes`` [max_boxes, 4] (x1, y1, x2, y2) in image coords and
    ``valid`` [max_boxes] bool.
    """
    gray = flow_gray_window(flow_win, inbox)
    se = morph.ellipse_se(cfg.head.close_ksize, cfg.head.close_ksize)
    # grayscale MORPH_CLOSE with crop-border emulation: outside-box pixels
    # are forced to the op's border identity before each stage
    dil = morph.dilate_gray(jnp.where(inbox, gray, 0), se)
    closed = morph.erode_gray(jnp.where(inbox, dil, 255), se)
    binary = cs.threshold_binary(jnp.where(inbox, closed, 0), cfg.head.seg_th)

    stats = comp.connected_components_with_stats(
        binary, connectivity=8, k_max=cfg.head.max_boxes
    )
    boxes = stats["boxes"].astype(jnp.float32)  # (x, y, w, h) window coords
    areas = stats["areas"].astype(jnp.float32)
    valid = stats["valid"] & (areas >= cfg.head.min_box_area)
    oy, ox = origin_yx
    xyxy = jnp.stack(
        [
            boxes[:, 0] + ox,
            boxes[:, 1] + oy,
            boxes[:, 0] + boxes[:, 2] + ox,
            boxes[:, 1] + boxes[:, 3] + oy,
        ],
        axis=-1,
    )
    keep = comp.nms(xyxy, areas, valid, cfg.head.nms_iou)
    return {"boxes": xyxy, "valid": keep & valid, "areas": areas}


@functools.partial(jax.jit, static_argnames=("cfg",))
def tracking_step(
    mem_u8: Array, prev_gray: Array, next_gray: Array, cfg: PipelineConfig
) -> dict[str, Array]:
    """One ROI-gated tracking step (merged FLAG=2 path)."""
    h, w = cfg.image_h, cfg.image_w
    wh, ww = cfg.win_shape
    r = roi_ops.roi_boxes(mem_u8, h, w, cfg.roi)
    box = r["merged"]
    active = r["any_active"]
    origin = roi_ops.window_origin(box, wh, ww, h, w)
    p_win = roi_ops.crop_window(prev_gray, origin, wh, ww)
    n_win = roi_ops.crop_window(next_gray, origin, wh, ww)
    flow_win = -farneback(p_win, n_win, cfg.fb)
    inbox = roi_ops.window_box_mask(box, origin, wh, ww) & active
    flow_win = jnp.where(inbox[..., None], flow_win, 0.0)
    out = tracking_head_window(flow_win, inbox, origin, cfg)
    out["valid"] = out["valid"] & active
    out["box"] = box
    out["any_active"] = active
    out["region_pct"] = roi_ops.region_percentage(box, h, w)
    return out


@functools.partial(
    jax.jit, static_argnames=("cfg", "warp_radius", "kernel_mode")
)
def tracking_batch_fast(
    mem_u8: Array,
    prev_gray: Array,
    next_gray: Array,
    cfg: PipelineConfig,
    warp_radius: int | None = None,
    kernel_mode: str = "auto",
) -> dict[str, Array]:
    """Throughput tracking: batched ROI gating + fast Farnebäck + vmapped
    head (same semantics as :func:`tracking_step` vmapped; see
    farneback_fast for the flow accuracy contract)."""
    from nsof_tpu.ops.farneback_fast import farneback_fast

    if warp_radius is None:
        warp_radius = cfg.warp_radius
    h, w = cfg.image_h, cfg.image_w
    wh, ww = cfg.win_shape
    r = jax.vmap(lambda m: roi_ops.roi_boxes(m, h, w, cfg.roi))(mem_u8)
    box = r["merged"]
    active = r["any_active"]
    origins = jax.vmap(
        lambda bx: roi_ops.window_origin(bx, wh, ww, h, w)
    )(box)
    p_win, oy, ox = roi_ops.crop_windows_batch(
        prev_gray, origins[0], origins[1], wh, ww
    )
    n_win, _, _ = roi_ops.crop_windows_batch(
        next_gray, origins[0], origins[1], wh, ww
    )
    flow_win = -farneback_fast(p_win, n_win, cfg.fb, warp_radius, kernel_mode)
    inbox = jax.vmap(
        lambda bx, y, x: roi_ops.window_box_mask(bx, (y, x), wh, ww)
    )(box, oy, ox)
    inbox = inbox & active[:, None, None]
    flow_win = jnp.where(inbox[..., None], flow_win, 0.0)
    out = jax.vmap(
        lambda f, ib, y, x: tracking_head_window(f, ib, (y, x), cfg)
    )(flow_win, inbox, oy, ox)
    out["valid"] = out["valid"] & active[:, None]
    out["box"] = box
    out["any_active"] = active
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def tracking_step_full(
    prev_gray: Array, next_gray: Array, cfg: PipelineConfig
) -> dict[str, Array]:
    """Full-frame baseline (region_coords (0,0,0,0) path,
    optical_flow_ob.py:625-630)."""
    h, w = cfg.image_h, cfg.image_w
    flow = -farneback(prev_gray, next_gray, cfg.fb)
    inbox = jnp.ones((h, w), bool)
    zero = jnp.zeros((), jnp.int32)
    return tracking_head_window(flow, inbox, (zero, zero), cfg)


def tracking_stages(cfg: PipelineConfig):
    """ROI stages plus the tracking head stages ('task', 'task_full') for
    per-stage replay timing; box→image-coordinate mapping happens inside
    the head (the reference's combination step), so 'comb' is a no-op."""
    from nsof_tpu.pipelines.segmentation import roi_stages

    h, w = cfg.image_h, cfg.image_w
    stages = roi_stages(cfg)

    @jax.jit
    def task(flow_win, inbox, origin, active):
        out = tracking_head_window(flow_win, inbox, origin, cfg)
        out["valid"] = out["valid"] & active
        return out

    @jax.jit
    def task_full(flow):
        zero = jnp.zeros((), jnp.int32)
        return tracking_head_window(
            flow, jnp.ones((h, w), bool), (zero, zero), cfg
        )

    stages.update({"task": task, "task_full": task_full})
    return stages


def mean_iou_vs_gt(boxes: Array, valid: Array, gt_box: Array) -> Array:
    """Average IoU of predicted boxes vs the GT max bbox, +1 convention
    (optical_flow_ob.py:589-609).  Returns 0 when no predictions."""
    x1 = jnp.maximum(boxes[:, 0], gt_box[0])
    y1 = jnp.maximum(boxes[:, 1], gt_box[1])
    x2 = jnp.minimum(boxes[:, 2], gt_box[2])
    y2 = jnp.minimum(boxes[:, 3], gt_box[3])
    inter = jnp.maximum(0.0, x2 - x1 + 1) * jnp.maximum(0.0, y2 - y1 + 1)
    area = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    gt_area = (gt_box[2] - gt_box[0] + 1) * (gt_box[3] - gt_box[1] + 1)
    iou = inter / (area + gt_area - inter)
    n = valid.sum()
    return jnp.where(n > 0, jnp.sum(jnp.where(valid, iou, 0.0)) / n, 0.0)


def max_bbox_from_mask(mask: Array, k_max: int = 32) -> tuple[Array, Array]:
    """Largest-rect-area component bbox of a binary mask
    (get_max_bbox_from_mask, optical_flow_ob.py:137-180).

    Returns ((x1, y1, x2, y2) float boxes, found flag).
    """
    stats = comp.connected_components_with_stats(mask, 8, k_max)
    rect_area = stats["boxes"][:, 2] * stats["boxes"][:, 3]
    rect_area = jnp.where(stats["valid"], rect_area, -1)
    i = jnp.argmax(rect_area)
    b = stats["boxes"][i]
    found = stats["valid"][i]
    return (
        jnp.stack([b[0], b[1], b[0] + b[2], b[1] + b[3]]).astype(jnp.float32),
        found,
    )
