"""Scene runners: dual-path execution + metrics + CSV reports.

The reference runs a Python loop per frame pair with host OpenCV calls;
here each pair runs one jit-compiled on-device program (see ``_map_pairs``
for why replay loops on the host rather than vmapping), with a dual
ROI/full-frame comparison and the reference's CSV schema.  For throughput
workloads use the batched fast paths (``seg_batch_fast`` and friends) or
the shard_map'd multi-chip runner in :mod:`nsof_tpu.parallel.inference`.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nsof_tpu.config import PipelineConfig
from nsof_tpu.data.scenes import SceneData
from nsof_tpu.pipelines import prediction as pred_pipe
from nsof_tpu.pipelines import segmentation as seg_pipe
from nsof_tpu.pipelines import tracking as trk_pipe
from nsof_tpu.utils import reporting


@dataclasses.dataclass
class SceneResult:
    masks: Optional[np.ndarray] = None
    masks_full: Optional[np.ndarray] = None
    boxes: Optional[np.ndarray] = None
    boxes_valid: Optional[np.ndarray] = None
    preds: Optional[np.ndarray] = None
    metrics: dict = dataclasses.field(default_factory=dict)
    timing: dict = dataclasses.field(default_factory=dict)


def _batched(scene: SceneData):
    n = scene.num_pairs
    mem = jnp.asarray(scene.mem_gray[1 : n + 1])
    prev = jnp.asarray(scene.frames_gray[:n])
    nxt = jnp.asarray(scene.frames_gray[1 : n + 1])
    return n, mem, prev, nxt


def _map_pairs(step_fn):
    """Batch a per-pair step by looping the jitted single-sample program
    on the host and stacking results.

    Rationale: on the current TPU toolchain, both vmapping and lax.map'ing
    the exact Farnebäck program at certain batch×shape combinations (e.g.
    pyr_scale 0.6 at 161×161 batch 19; 1920×1080 under lax.map) fault the
    TPU worker — XLA codegen bugs we bisected to the composed batched
    program, not any single op.  The plain jitted per-pair program is
    stable across every bundled scene, and scene replay is not the
    throughput path (seg_batch_fast is), so the host loop's dispatch
    overhead is acceptable.
    """
    jitted = jax.jit(step_fn)

    def run(*batched):
        n = batched[0].shape[0]
        outs = [jitted(*(b[i] for b in batched)) for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    return run


def run_segmentation(
    scene: SceneData, csv_path: Optional[str] = None
) -> SceneResult:
    """Dual-path motion segmentation over a whole scene."""
    cfg = scene.cfg
    n, mem, prev, nxt = _batched(scene)

    roi_fn = _map_pairs(lambda m, p, x: seg_pipe.seg_step(m, p, x, cfg))
    full_fn = _map_pairs(lambda p, x: seg_pipe.seg_step_full(p, x, cfg))

    t0 = time.perf_counter()
    roi_out = jax.block_until_ready(roi_fn(mem, prev, nxt))
    t_roi = time.perf_counter() - t0
    t0 = time.perf_counter()
    full_out = jax.block_until_ready(full_fn(prev, nxt))
    t_full = time.perf_counter() - t0

    res = SceneResult(
        masks=np.asarray(roi_out["mask"]),
        masks_full=np.asarray(full_out["mask"]),
    )
    res.timing = {
        "roi_s_total": t_roi,
        "full_s_total": t_full,
        "roi_ms_per_pair": 1e3 * t_roi / n,
        "full_ms_per_pair": 1e3 * t_full / n,
    }
    if scene.gt_masks is not None:
        gt = scene.gt_masks[1 : n + 1]
        pa_roi = [
            float(seg_pipe.pixel_accuracy(res.masks[i], gt[i]))
            for i in range(n)
        ]
        pa_full = [
            float(seg_pipe.pixel_accuracy(res.masks_full[i], gt[i]))
            for i in range(n)
        ]
        res.metrics = {
            "mem_pa_mean": float(np.mean(pa_roi)),
            "orig_pa_mean": float(np.mean(pa_full)),
        }
        if csv_path:
            report = reporting.CsvReport(csv_path, reporting.SEG_COLUMNS)
            for i in range(n):
                report.add(
                    {
                        "Frame_Pair": f"{scene.names[i+1]}-{scene.names[i]}",
                        "Original_Flow_Time": f"{t_full / n:.4f}",
                        "Mem_Flow_Time": f"{t_roi / n:.4f}",
                        "Flow_Time_Improvement": f"{(t_full - t_roi) / n:.4f}",
                        "Flow_Time_Improvement_Percent": (
                            f"{100 * (t_full - t_roi) / max(t_full, 1e-9):.2f}"
                        ),
                        "Original_PA": f"{pa_full[i]:.4f}",
                        "Mem_PA": f"{pa_roi[i]:.4f}",
                        "Region_Percent": (
                            f"{float(roi_out['region_pct'][i]):.2f}"
                        ),
                    }
                )
    return res


def run_tracking(scene: SceneData, csv_path: Optional[str] = None) -> SceneResult:
    """Dual-path object tracking over a scene; IoU vs the GT max bbox."""
    cfg = scene.cfg
    n, mem, prev, nxt = _batched(scene)
    roi_fn = _map_pairs(lambda m, p, x: trk_pipe.tracking_step(m, p, x, cfg))
    t0 = time.perf_counter()
    out = jax.block_until_ready(roi_fn(mem, prev, nxt))
    t_roi = time.perf_counter() - t0

    res = SceneResult(
        boxes=np.asarray(out["boxes"]), boxes_valid=np.asarray(out["valid"])
    )
    res.timing = {"roi_s_total": t_roi, "roi_ms_per_pair": 1e3 * t_roi / n}
    if scene.gt_masks is not None:
        ious = []
        for i in range(n):
            gt_box, found = trk_pipe.max_bbox_from_mask(
                jnp.asarray(scene.gt_masks[i + 1])
            )
            if bool(found):
                iou = trk_pipe.mean_iou_vs_gt(
                    jnp.asarray(res.boxes[i]),
                    jnp.asarray(res.boxes_valid[i]),
                    gt_box,
                )
                ious.append(float(iou))
        res.metrics = {"mean_iou": float(np.mean(ious)) if ious else 0.0}
    return res


def run_prediction(scene: SceneData, csv_path: Optional[str] = None) -> SceneResult:
    """Dual-path future-frame prediction; SSIM vs true frame i+2."""
    cfg = scene.cfg
    n = scene.num_pairs
    mem = jnp.asarray(scene.mem_gray[1 : n + 1])
    prev = jnp.asarray(scene.frames_gray[:n])
    nxt = jnp.asarray(scene.frames_gray[1 : n + 1])
    nxt_bgr = jnp.asarray(scene.frames_bgr[1 : n + 1])

    roi_fn = _map_pairs(
        lambda m, p, x, f: pred_pipe.prediction_step(m, p, x, f, cfg)
    )
    t0 = time.perf_counter()
    out = jax.block_until_ready(roi_fn(mem, prev, nxt, nxt_bgr))
    t_roi = time.perf_counter() - t0
    res = SceneResult(preds=np.asarray(out["pred"]))
    res.timing = {"roi_s_total": t_roi, "roi_ms_per_pair": 1e3 * t_roi / n}

    ssims = []
    for i in range(n):
        true_future = scene.frames_bgr[i + 2]
        ssims.append(
            float(pred_pipe.prediction_ssim(res.preds[i], true_future))
        )
    res.metrics = {"mean_ssim": float(np.mean(ssims))}
    return res
