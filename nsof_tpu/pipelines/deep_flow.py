"""ROI-gated deep flow backends (the reference's raft_seg.py / ff_seg.py).

The deep pipelines differ from the Farnebäck ones in three ways
(codebase/RAFT/raft_seg.py): frames are resized to 1/3 (:62-72), the
device-cell size scales accordingly (MEMSIZE/3, :460-464), and the flow is
NOT negated (the ``flow = -flow`` inversion is Farnebäck-only,
optical_flow_seg.py:460).  Inference pads the window to a multiple of 8,
runs ``iters`` refinement steps, and unpads (runraft, :91-98).  Regions
smaller than 64 px are skipped (:133-135).

Backends plug in as (apply_fn, params) pairs over the Flax RAFT /
FlowFormer models; both share this gating wrapper exactly as the reference
duplicates its skeleton per backend.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

from nsof_tpu.config import PipelineConfig
from nsof_tpu.ops import roi as roi_ops
from nsof_tpu.pipelines.segmentation import seg_head_window

Array = jnp.ndarray

MIN_REGION_PX = 64  # raft_seg.py:133-135


@dataclasses.dataclass
class DeepBackend:
    """A deep flow model bound to parameters.

    ``apply(img1, img2) -> flow [B, H, W, 2]`` on /8-padded uint8 RGB.
    """

    apply: Callable[[Array, Array], Array]
    name: str = "raft"

    @classmethod
    def from_raft(cls, model, params, iters: int = 20):
        def apply(img1, img2):
            _, up = model.apply(
                {"params": params}, img1, img2, iters=iters, test_mode=True
            )
            return up

        return cls(apply=apply, name="raft")

    @classmethod
    def from_flowformer(cls, model, params):
        def apply(img1, img2):
            return model.apply(
                {"params": params}, img1, img2, test_mode=True
            )

        return cls(apply=apply, name="flowformer")


def resize_third(img: Array) -> Array:
    """The deep pipelines' 1/3 input resize (raft_seg.py:62-72)."""
    h, w = img.shape[-3:-1]
    nh, nw = h // 3, w // 3
    return jax.image.resize(
        img, img.shape[:-3] + (nh, nw, img.shape[-1]), "bilinear",
        antialias=False,
    )


def _pad8(x: Array):
    h, w = x.shape[1:3]
    ph = (-h) % 8
    pw = (-w) % 8
    pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    return jnp.pad(x, pads, mode="edge"), pads


def _deep_roi_gate(
    mem_u8: Array,
    prev_rgb: Array,
    next_rgb: Array,
    cfg: PipelineConfig,
    backend: DeepBackend,
) -> dict[str, Array]:
    """Shared ROI gating + windowed deep flow for the three task heads.

    Merged FLAG=2 box scaled by memsize/3 (raft_seg.py:460-464), backend
    run on a fixed window padded to /8, masked to the box; returns the
    windowed flow plus the gating descriptor.
    """
    h, w = prev_rgb.shape[:2]
    roi_cfg = dataclasses.replace(
        cfg.roi, memsize=max(cfg.roi.memsize // 3, 1)
    )
    r = roi_ops.roi_boxes(mem_u8, h, w, roi_cfg)
    box = r["merged"]
    wide = (box[2] - box[0]) >= MIN_REGION_PX
    tall = (box[3] - box[1]) >= MIN_REGION_PX
    active = r["any_active"] & wide & tall

    wh = cfg.window_h or h
    ww = cfg.window_w or w
    origin = roi_ops.window_origin(box, wh, ww, h, w)
    p_win = roi_ops.crop_window(prev_rgb, origin, wh, ww)
    n_win = roi_ops.crop_window(next_rgb, origin, wh, ww)

    p_pad, pads = _pad8(p_win[None])
    n_pad, _ = _pad8(n_win[None])
    flow_pad = backend.apply(p_pad, n_pad)
    t, l = pads[1][0], pads[2][0]
    flow_win = flow_pad[0, t : t + wh, l : l + ww]

    inbox = roi_ops.window_box_mask(box, origin, wh, ww) & active
    flow_win = jnp.where(inbox[..., None], flow_win, 0.0)
    return {
        "flow_win": flow_win,
        "inbox": inbox,
        "box": box,
        "origin": origin,
        "any_active": active,
        "region_pct": roi_ops.region_percentage(box, h, w),
    }


def deep_roi_flow_step(
    mem_u8: Array,
    prev_rgb: Array,
    next_rgb: Array,
    cfg: PipelineConfig,
    backend: DeepBackend,
) -> dict[str, Array]:
    """One ROI-gated deep-flow SEG step on already 1/3-resized [H, W, 3]
    frames (raft_seg.py / ff_seg.py): gate, backend flow, scatter into a
    zero flow field, seg head (no Farnebäck inversion)."""
    h, w = prev_rgb.shape[:2]
    g = _deep_roi_gate(mem_u8, prev_rgb, next_rgb, cfg, backend)
    box, origin = g["box"], g["origin"]
    flow = roi_ops.scatter_window(
        jnp.zeros((h, w, 2), jnp.float32), g["flow_win"], box, origin
    )
    mask_win = seg_head_window(g["flow_win"], g["inbox"], cfg)
    mask = roi_ops.scatter_window(
        jnp.zeros((h, w), jnp.uint8), mask_win, box, origin
    )
    return {
        "flow": flow,
        "mask": mask,
        "box": box,
        "any_active": g["any_active"],
        "region_pct": g["region_pct"],
    }


def deep_roi_tracking_step(
    mem_u8: Array,
    prev_rgb: Array,
    next_rgb: Array,
    cfg: PipelineConfig,
    backend: DeepBackend,
) -> dict[str, Array]:
    """ROI-gated deep tracking (raft_ob.py / ff_ob.py semantics): the
    same gating as the seg step, with the Farnebäck tracking head
    (HSV→gray→close→threshold→components→area filter→NMS) on the deep
    flow — 1/3 resize, MEMSIZE/3, no negation."""
    from nsof_tpu.pipelines.tracking import tracking_head_window

    g = _deep_roi_gate(mem_u8, prev_rgb, next_rgb, cfg, backend)
    out = tracking_head_window(g["flow_win"], g["inbox"], g["origin"], cfg)
    out["valid"] = out["valid"] & g["any_active"]
    out["box"] = g["box"]
    out["any_active"] = g["any_active"]
    out["region_pct"] = g["region_pct"]
    return out


def deep_roi_prediction_step(
    mem_u8: Array,
    prev_rgb: Array,
    next_rgb: Array,
    next_frame: Array,
    cfg: PipelineConfig,
    backend: DeepBackend,
) -> dict[str, Array]:
    """ROI-gated deep future-frame prediction (raft_prediction.py /
    ff_prediction.py): deep flow scattered into the frame, grid+flow
    remap warp inside the box, pass-through outside."""
    from nsof_tpu.pipelines.prediction import warp_region

    h, w = prev_rgb.shape[:2]
    g = _deep_roi_gate(mem_u8, prev_rgb, next_rgb, cfg, backend)
    flow = roi_ops.scatter_window(
        jnp.zeros((h, w, 2), jnp.float32), g["flow_win"], g["box"],
        g["origin"],
    )
    box_eff = jnp.where(g["any_active"], g["box"], jnp.zeros(4, jnp.int32))
    pred = warp_region(next_frame, flow, box_eff)
    return {
        "pred": pred,
        "flow": flow,
        "box": g["box"],
        "any_active": g["any_active"],
        "region_pct": g["region_pct"],
    }


def deep_roi_flow_batch(
    mem_u8: Array,
    prev_rgb: Array,
    next_rgb: Array,
    cfg: PipelineConfig,
    backend: DeepBackend,
) -> dict[str, Array]:
    """Batched ROI-gated deep SEG step: [B, gh, gw] device maps +
    [B, H, W, 3] frame pairs → batched masks/flows.  Semantically
    ``vmap(deep_roi_flow_step)`` but restructured for TPU serving:

    * the gate (threshold → CC → merged box) is vmapped — it runs on the
      tiny device grid, so the batched scan cost is negligible;
    * window crop / scatter use the one-hot matmul forms
      (:func:`nsof_tpu.ops.roi.onehot_crop_batch` /
      :func:`onehot_scatter_batch`) — vmapped ``dynamic_slice`` /
      ``dynamic_update_slice`` with per-sample offsets lower to
      per-element gathers/scatters on TPU (measured ~29 ms/frame at any
      batch, scripts/bench_deep_batch_sweep.py);
    * the backend runs ONCE on a true [B, wh, ww, 3] batch (no vmap
      around the model);
    * the seg head runs bit-packed batch-major
      (:func:`seg_head_window_batch`).

    Reference shape analogue: raft_seg.py:91-98 runs one window per
    forward; this is the many-concurrent-windows serving form.
    """
    from nsof_tpu.pipelines.segmentation import seg_head_window_batch

    h, w = prev_rgb.shape[1:3]
    roi_cfg = dataclasses.replace(
        cfg.roi, memsize=max(cfg.roi.memsize // 3, 1)
    )
    r = jax.vmap(lambda m: roi_ops.roi_boxes(m, h, w, roi_cfg))(mem_u8)
    box = r["merged"]  # [B, 4]
    wide = (box[:, 2] - box[:, 0]) >= MIN_REGION_PX
    tall = (box[:, 3] - box[:, 1]) >= MIN_REGION_PX
    active = r["any_active"] & wide & tall

    wh = cfg.window_h or h
    ww = cfg.window_w or w
    oys, oxs = jax.vmap(
        lambda b: roi_ops.window_origin(b, wh, ww, h, w)
    )(box)
    p_win = roi_ops.onehot_crop_batch(prev_rgb, oys, oxs, wh, ww)
    n_win = roi_ops.onehot_crop_batch(next_rgb, oys, oxs, wh, ww)

    p_pad, pads = _pad8(p_win)
    n_pad, _ = _pad8(n_win)
    flow_pad = backend.apply(p_pad, n_pad)
    t, l = pads[1][0], pads[2][0]
    flow_win = flow_pad[:, t : t + wh, l : l + ww]

    inbox = jax.vmap(
        lambda b, oy, ox: roi_ops.window_box_mask(b, (oy, ox), wh, ww)
    )(box, oys, oxs) & active[:, None, None]
    flow_win = jnp.where(inbox[..., None], flow_win, 0.0)
    mask_win = seg_head_window_batch(flow_win, inbox, cfg)
    flow = roi_ops.onehot_scatter_batch(flow_win, oys, oxs, h, w)
    mask = roi_ops.onehot_scatter_batch(mask_win, oys, oxs, h, w)
    return {
        "flow": flow,
        "mask": mask,
        "box": box,
        "any_active": active,
        "region_pct": jax.vmap(
            lambda b: roi_ops.region_percentage(b, h, w)
        )(box),
    }


def deep_full_flow_step(
    prev_rgb: Array, next_rgb: Array, cfg: PipelineConfig,
    backend: DeepBackend,
) -> dict[str, Array]:
    """Full-frame seg baseline for the deep pipelines."""
    h, w = prev_rgb.shape[:2]
    p_pad, pads = _pad8(prev_rgb[None])
    n_pad, _ = _pad8(next_rgb[None])
    flow_pad = backend.apply(p_pad, n_pad)
    t, l = pads[1][0], pads[2][0]
    flow = flow_pad[0, t : t + h, l : l + w]
    inbox = jnp.ones((h, w), bool)
    mask = seg_head_window(flow, inbox, cfg)
    return {"flow": flow, "mask": mask}


def deep_full_tracking_step(
    prev_rgb: Array, next_rgb: Array, cfg: PipelineConfig,
    backend: DeepBackend,
) -> dict[str, Array]:
    """Full-frame tracking baseline (raft_ob.py full path)."""
    from nsof_tpu.pipelines.tracking import tracking_head_window

    h, w = prev_rgb.shape[:2]
    flow = deep_full_flow_step(prev_rgb, next_rgb, cfg, backend)["flow"]
    zero = jnp.zeros((), jnp.int32)
    return tracking_head_window(
        flow, jnp.ones((h, w), bool), (zero, zero), cfg
    )


def deep_full_prediction_step(
    prev_rgb: Array, next_rgb: Array, next_frame: Array,
    cfg: PipelineConfig, backend: DeepBackend,
) -> dict[str, Array]:
    """Full-frame prediction baseline (raft_prediction.py full path)."""
    from nsof_tpu.pipelines.prediction import warp_region

    h, w = prev_rgb.shape[:2]
    flow = deep_full_flow_step(prev_rgb, next_rgb, cfg, backend)["flow"]
    box = jnp.asarray([0, 0, w, h], jnp.int32)
    return {"pred": warp_region(next_frame, flow, box), "flow": flow}
