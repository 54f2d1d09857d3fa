"""Motion-segmentation pipeline (the reference's canonical pipeline,
``optical_flow_seg.py``), fully on-device.

Per frame pair: the device-state map gates a ROI (merged FLAG=2 box by
default); Farnebäck flow is computed on a fixed-size window around the ROI
and scattered into a zero flow field (:159/:204 semantics); the task head
thresholds flow magnitude and smooths with 5× (dilate ∘ erode) using a 10×10
elliptical SE (:322-357); the full-frame baseline runs the same head on
whole-image flow (:492-541).  Everything is one jit-compiled function per
dataset preset, vmap-batchable over frame pairs.

Crop-boundary faithfulness: the reference runs morphology on the *cropped*
region, so OpenCV's border convention applies at the box edge (-inf for
dilate, +inf for erode).  With a fixed window we emulate this by re-masking
between every dilate/erode: outside-box pixels are forced to background
before a dilation and to foreground before an erosion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nsof_tpu.config import PipelineConfig
from nsof_tpu.ops import colorspace as cs
from nsof_tpu.ops import morphology as morph
from nsof_tpu.ops import roi as roi_ops
from nsof_tpu.ops.farneback import farneback

Array = jnp.ndarray


def seg_head_window(
    flow_win: Array, inbox: Array, cfg: PipelineConfig
) -> Array:
    """The reference seg head on a fixed window restricted to ``inbox``.

    flow magnitude > SEG_TH → {0,255} mask → N × (dilate; erode) with the
    elliptical SE, crop-border semantics emulated via re-masking → >1
    binarise (optical_flow_seg.py:322-357).
    """
    mag = jnp.sqrt(flow_win[..., 0] ** 2 + flow_win[..., 1] ** 2)
    mask = jnp.where((mag > cfg.head.seg_th) & inbox, 255, 0).astype(jnp.uint8)
    se = morph.ellipse_se(cfg.head.morph_ksize, cfg.head.morph_ksize)
    for _ in range(cfg.head.morph_iters):
        mask = morph.dilate_binary(jnp.where(inbox, mask, 0), se)
        mask = morph.erode_binary(jnp.where(inbox, mask, 255), se)
    mask = jnp.where(inbox, mask, 0)
    return cs.threshold_binary(mask, 1, 255)


@functools.partial(jax.jit, static_argnames=("cfg",))
def seg_step(
    mem_u8: Array,
    prev_gray: Array,
    next_gray: Array,
    cfg: PipelineConfig,
) -> dict[str, Array]:
    """One ROI-gated segmentation step (merged-region FLAG=2 path).

    Args:
        mem_u8: [gh, gw] uint8 device-state map (the *second* slice of the
            pair; only memimg2 feeds the ROI, optical_flow_seg.py:219).
        prev_gray/next_gray: [H, W] uint8 grayscale frames.

    Returns dict with ``mask`` [H, W] uint8 {0,255}, ``flow`` [H, W, 2]
    (already negated, :461), ``box`` [4], ``any_active``, ``region_pct``.
    """
    h, w = cfg.image_h, cfg.image_w
    wh, ww = cfg.win_shape
    r = roi_ops.roi_boxes(mem_u8, h, w, cfg.roi)
    box = r["merged"]
    active = r["any_active"]

    origin = roi_ops.window_origin(box, wh, ww, h, w)
    p_win = roi_ops.crop_window(prev_gray, origin, wh, ww)
    n_win = roi_ops.crop_window(next_gray, origin, wh, ww)
    flow_win = farneback(p_win, n_win, cfg.fb)
    flow_win = -flow_win  # Farnebäck inversion (optical_flow_seg.py:461)

    inbox = roi_ops.window_box_mask(box, origin, wh, ww)
    flow_win = jnp.where((inbox & active)[..., None], flow_win, 0.0)

    mask_win = seg_head_window(flow_win, inbox & active, cfg)

    flow = roi_ops.scatter_window(
        jnp.zeros((h, w, 2), jnp.float32), flow_win, box, origin
    )
    mask = roi_ops.scatter_window(
        jnp.zeros((h, w), jnp.uint8), mask_win, box, origin
    )
    return {
        "mask": mask,
        "flow": flow,
        "box": box,
        "any_active": active,
        "region_pct": roi_ops.region_percentage(box, h, w),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def seg_step_full(
    prev_gray: Array, next_gray: Array, cfg: PipelineConfig
) -> dict[str, Array]:
    """Full-frame baseline: whole-image Farnebäck + the same head
    (optical_flow_seg.py:492-541)."""
    h, w = cfg.image_h, cfg.image_w
    flow = -farneback(prev_gray, next_gray, cfg.fb)
    inbox = jnp.ones((h, w), bool)
    mask = seg_head_window(flow, inbox, cfg)
    return {"mask": mask, "flow": flow}


def seg_batch(mem_u8, prev_gray, next_gray, cfg: PipelineConfig):
    """vmap the ROI-gated step over a batch of frame pairs."""
    return jax.vmap(lambda m, p, n: seg_step(m, p, n, cfg))(
        mem_u8, prev_gray, next_gray
    )


def roi_stages(cfg: PipelineConfig):
    """Jitted ROI/flow stage programs shared by the replay runners.

    Mirrors the reference's per-stage bracketing (mem_cal_times around the
    threshold+CC+box step, mem_velocity_times around the backend flow call,
    optical_flow_seg.py:51-59,211-252): 'cal' maps the device state to the
    ROI descriptor, 'vel' computes the windowed (negated, masked) flow,
    'vel_full' the full-frame flow.  ``cfg.roi.mode`` selects the merged
    FLAG=2 path or the FLAG=1 separate-regions path (per-component flow,
    union-box head window); 'vel' uniformly takes (prev, next, mem, roi)
    with roi the dict 'cal' returned.
    """
    h, w = cfg.image_h, cfg.image_w
    wh, ww = cfg.win_shape
    separate = cfg.roi.mode == 1

    @jax.jit
    def cal(mem_u8):
        from nsof_tpu.pipelines.separate import union_box

        r = roi_ops.roi_boxes(mem_u8, h, w, cfg.roi)
        active = r["any_active"]
        if separate:
            box = union_box(
                r["boxes"], r["valid"], cfg.roi.padding, h, w
            )
            pct = jnp.sum(
                jax.vmap(lambda b: roi_ops.region_percentage(b, h, w))(
                    r["boxes"]
                )
                * r["valid"]
            )
        else:
            box = r["merged"]
            pct = roi_ops.region_percentage(box, h, w)
        origin = roi_ops.window_origin(box, wh, ww, h, w)
        return {
            "box": box,
            "active": active,
            "origin": origin,
            "region_pct": pct,
        }

    @jax.jit
    def vel(prev_gray, next_gray, mem_u8, roi):
        box, active, origin = roi["box"], roi["active"], roi["origin"]
        if separate:
            from nsof_tpu.pipelines.separate import separate_flow_field

            ff = separate_flow_field(mem_u8, prev_gray, next_gray, cfg)
            flow_win = roi_ops.crop_window(-ff["flow"], origin, wh, ww)
        else:
            p_win = roi_ops.crop_window(prev_gray, origin, wh, ww)
            n_win = roi_ops.crop_window(next_gray, origin, wh, ww)
            flow_win = -farneback(p_win, n_win, cfg.fb)
        inbox = roi_ops.window_box_mask(box, origin, wh, ww) & active
        return jnp.where(inbox[..., None], flow_win, 0.0), inbox

    @jax.jit
    def vel_full(prev_gray, next_gray):
        return -farneback(prev_gray, next_gray, cfg.fb)

    return {"cal": cal, "vel": vel, "vel_full": vel_full}


def seg_stages(cfg: PipelineConfig):
    """ROI stages plus the seg head/scatter stages ('task', 'comb',
    'task_full') for per-stage replay timing."""
    h, w = cfg.image_h, cfg.image_w
    stages = roi_stages(cfg)

    @jax.jit
    def task(flow_win, inbox):
        return seg_head_window(flow_win, inbox, cfg)

    @jax.jit
    def comb(mask_win, box, origin):
        return roi_ops.scatter_window(
            jnp.zeros((h, w), jnp.uint8), mask_win, box, origin
        )

    @jax.jit
    def task_full(flow):
        return seg_head_window(flow, jnp.ones((h, w), bool), cfg)

    stages.update({"task": task, "comb": comb, "task_full": task_full})
    return stages


def _seg_head_mag2_hwb(
    mag2_hwb: Array, inbox_hwb: Array, cfg: PipelineConfig
) -> Array:
    """Seg head on |flow|² in batch-in-lanes [h, w, B] layout → [B, h, w]
    uint8 mask.  Bit-packed morphology (nsof_tpu.ops.morphology_fast)."""
    from nsof_tpu.ops import morphology_fast as mf

    x = (mag2_hwb > cfg.head.seg_th**2) & inbox_hwb
    se = morph.ellipse_se(cfg.head.morph_ksize, cfg.head.morph_ksize)
    x = mf.dilate_erode_n_masked_hwb(x, inbox_hwb, se,
                                     cfg.head.morph_iters)
    return jnp.where(x.transpose(2, 0, 1), 255, 0).astype(jnp.uint8)


def seg_head_window_batch(
    flow_win: Array, inbox: Array, cfg: PipelineConfig
) -> Array:
    """Batched seg head in batch-major layout: [B, h, w, 2] flow +
    [B, h, w] mask → [B, h, w] uint8 {0,255}.  Same semantics as
    :func:`seg_head_window` (crop-border emulation via re-masking) but the
    morphology runs bit-packed on [h, w, B] — no 100-tap convs."""
    mag2 = flow_win[..., 0] ** 2 + flow_win[..., 1] ** 2
    return _seg_head_mag2_hwb(
        mag2.transpose(1, 2, 0), inbox.transpose(1, 2, 0), cfg
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "warp_radius", "kernel_mode", "return_flow"),
)
def seg_batch_fast(
    mem_u8: Array,
    prev_gray: Array,
    next_gray: Array,
    cfg: PipelineConfig,
    warp_radius: int | None = None,
    kernel_mode: str = "auto",
    return_flow: bool = False,
) -> dict[str, Array]:
    """Throughput path: batched ROI gating + the TPU fast Farnebäck.

    Same semantics as :func:`seg_step` vmapped, but flow comes from
    :func:`nsof_tpu.ops.farneback_fast.farneback_fast` (batch-in-lanes
    layout, Pallas-fused warp) — see that module for its accuracy contract
    vs the exact OpenCV-parity path.

    ``warp_radius=None`` uses the dataset preset's audited radius
    (``cfg.warp_radius``, selected by scripts/audit_fast_path.py).
    ``return_flow=True`` adds the scattered full-image ``flow`` [B,H,W,2]
    (negated, zeros outside the ROI — seg_step's semantics) for accuracy
    audits; the throughput path skips it.
    """
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
    # DMA-based crops round origins down to the uint8 tile grid (32, 128);
    # both crops and the scatter below must use the adjusted origins
    p_win, oy, ox = roi_ops.crop_windows_batch(
        prev_gray, origins[0], origins[1], wh, ww
    )
    n_win, _, _ = roi_ops.crop_windows_batch(
        next_gray, origins[0], origins[1], wh, ww
    )
    origins = (oy, ox)

    # planes layout: [wh, ww, B] dx/dy straight from the fast path (no
    # [B,H,W,2] stack/transpose round-trips); the head only needs |flow|²
    # so the Farnebäck sign inversion is irrelevant here
    dxp, dyp = farneback_fast(
        p_win, n_win, cfg.fb, warp_radius, kernel_mode,
        out_layout="planes",
    )

    inbox = jax.vmap(
        lambda bx, oy, ox: roi_ops.window_box_mask(bx, (oy, ox), wh, ww)
    )(box, origins[0], origins[1])
    inbox = inbox & active[:, None, None]

    mag2 = dxp * dxp + dyp * dyp  # [wh, ww, B]
    mask_win = _seg_head_mag2_hwb(mag2, inbox.transpose(1, 2, 0), cfg)
    mask = jax.vmap(
        lambda mw, bx, oy, ox: roi_ops.scatter_window(
            jnp.zeros((h, w), jnp.uint8), mw, bx, (oy, ox)
        )
    )(mask_win, box, origins[0], origins[1])
    out = {
        "mask": mask,
        "box": box,
        "any_active": active,
        "region_pct": jax.vmap(
            lambda bx: roi_ops.region_percentage(bx, h, w)
        )(box),
    }
    if return_flow:
        # [wh, ww, B] planes → [B, wh, ww, 2], negated (optical_flow_
        # seg.py:461), zeroed outside the box, scattered like seg_step
        flow_win = jnp.stack(
            [-dxp.transpose(2, 0, 1), -dyp.transpose(2, 0, 1)], axis=-1
        )
        flow_win = jnp.where(inbox[..., None], flow_win, 0.0)
        out["flow"] = jax.vmap(
            lambda fw, bx, oy, ox: roi_ops.scatter_window(
                jnp.zeros((h, w, 2), jnp.float32), fw, bx, (oy, ox)
            )
        )(flow_win, box, origins[0], origins[1])
    return out


def pixel_accuracy(pred: Array, gt: Array) -> Array:
    """calculate_pixel_accuracy (optical_flow_seg.py:384-388): % of equal
    pixels."""
    return 100.0 * jnp.mean((pred == gt).astype(jnp.float32))
