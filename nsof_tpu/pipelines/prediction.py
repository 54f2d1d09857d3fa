"""Future-frame prediction pipeline (``optical_flow_prediction.py``).

Head: within the ROI box, build ``flow_map = grid + flow`` and resample the
*next* frame at those coordinates (cv2.remap INTER_LINEAR BORDER_REPLICATE
semantics, optical_flow_prediction.py:281-300 — note the reference samples
from the full-resolution next frame, so coordinates may leave the box);
outside the box the prediction is the unmodified next frame.  The quality
metric is SSIM of channel 2 against the true frame i+2
(calculateIntegralError, :113-115).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nsof_tpu.config import PipelineConfig
from nsof_tpu.ops import roi as roi_ops
from nsof_tpu.ops.farneback import farneback
from nsof_tpu.ops.ssim import ssim
from nsof_tpu.ops.warp import remap_bilinear

Array = jnp.ndarray


def warp_region(next_frame: Array, flow: Array, box: Array) -> Array:
    """Remap ``next_frame`` by grid+flow inside ``box`` only.

    flow is full-resolution (zeros outside the box); sampling coordinates
    are clamped (BORDER_REPLICATE).  Outside the box, pixels pass through.
    """
    h, w = next_frame.shape[:2]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + flow[..., 0]
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + flow[..., 1]
    warped = remap_bilinear(next_frame, xs, ys)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    inbox = (
        (col >= box[0]) & (col < box[2]) & (row >= box[1]) & (row < box[3])
    )
    if next_frame.ndim == 3:
        inbox = inbox[..., None]
    return jnp.where(inbox, warped, next_frame)


@functools.partial(jax.jit, static_argnames=("cfg",))
def prediction_step(
    mem_u8: Array,
    prev_gray: Array,
    next_gray: Array,
    next_frame: Array,
    cfg: PipelineConfig,
) -> dict[str, Array]:
    """One ROI-gated prediction step (merged FLAG=2 path).

    Returns ``pred`` (the synthesised frame i+2 estimate), ``flow``, ``box``.
    """
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
    flow = roi_ops.scatter_window(
        jnp.zeros((h, w, 2), jnp.float32), flow_win, box, origin
    )
    box_eff = jnp.where(active, box, jnp.zeros_like(box))
    pred = warp_region(next_frame, flow, box_eff)
    return {
        "pred": pred,
        "flow": flow,
        "box": box,
        "any_active": active,
        "region_pct": roi_ops.region_percentage(box, h, w),
    }


@functools.partial(
    jax.jit, static_argnames=("cfg", "warp_radius", "kernel_mode")
)
def prediction_batch_fast(
    mem_u8: Array,
    prev_gray: Array,
    next_gray: Array,
    next_frame: Array,
    cfg: PipelineConfig,
    warp_radius: int | None = None,
    kernel_mode: str = "auto",
) -> dict[str, Array]:
    """Throughput prediction: batched ROI gating + fast Farnebäck + vmapped
    region warp (same semantics as :func:`prediction_step` vmapped)."""
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
    flow = jax.vmap(
        lambda fw, bx, y, x: roi_ops.scatter_window(
            jnp.zeros((h, w, 2), jnp.float32), fw, bx, (y, x)
        )
    )(flow_win, box, oy, ox)
    box_eff = jnp.where(active[:, None], box, jnp.zeros_like(box))
    pred = jax.vmap(warp_region)(next_frame, flow, box_eff)
    return {"pred": pred, "flow": flow, "box": box, "any_active": active}


@functools.partial(jax.jit, static_argnames=("cfg",))
def prediction_step_full(
    prev_gray: Array, next_gray: Array, next_frame: Array, cfg: PipelineConfig
) -> dict[str, Array]:
    """Full-frame baseline: warp the whole image
    (optical_flow_prediction.py:581-597)."""
    h, w = cfg.image_h, cfg.image_w
    flow = -farneback(prev_gray, next_gray, cfg.fb)
    box = jnp.asarray([0, 0, w, h], jnp.int32)
    return {"pred": warp_region(next_frame, flow, box), "flow": flow}


def prediction_stages(cfg: PipelineConfig):
    """ROI stages plus prediction stages for per-stage replay timing:
    'comb' scatters the windowed flow into the frame (the reference's
    combination step), 'task' does the grid+flow remap warp
    (optical_flow_prediction.py:281-300), 'task_full' the full-frame
    warp."""
    from nsof_tpu.pipelines.segmentation import roi_stages

    h, w = cfg.image_h, cfg.image_w
    stages = roi_stages(cfg)

    @jax.jit
    def comb(flow_win, box, origin):
        return roi_ops.scatter_window(
            jnp.zeros((h, w, 2), jnp.float32), flow_win, box, origin
        )

    @jax.jit
    def task(next_frame, flow, box, active):
        box_eff = jnp.where(active, box, jnp.zeros_like(box))
        return warp_region(next_frame, flow, box_eff)

    @jax.jit
    def task_full(next_frame, flow):
        box = jnp.asarray([0, 0, w, h], jnp.int32)
        return warp_region(next_frame, flow, box)

    stages.update({"comb": comb, "task": task, "task_full": task_full})
    return stages


def prediction_ssim(pred: Array, true_future: Array) -> Array:
    """SSIM on channel 2 (R of a BGR frame) vs the true frame i+2,
    data_range 255 (optical_flow_prediction.py:113-115)."""
    return ssim(true_future[..., 2], pred[..., 2], data_range=255.0)
