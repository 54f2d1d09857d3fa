"""End-to-end golden tests: our jit pipelines vs a direct numpy/cv2
transliteration of the reference scripts, on the bundled tabletennis scene
(small: 160×160, 21 frames)."""

import cv2
import numpy as np
import pytest

from nsof_tpu.config import DATASETS
from tests.conftest import REFERENCE_DATA, requires_reference_data

pytestmark = requires_reference_data


@pytest.fixture(scope="module")
def tt_scene():
    from nsof_tpu.data.scenes import load_scene

    return load_scene(REFERENCE_DATA, "tabletennis")


def _reference_seg_pair(mem2, prev_gray, next_gray, cfg):
    """Transliteration of the reference seg pipeline for one pair
    (optical_flow_seg.py FLAG=2 path) with the tabletennis preset."""
    h, w = prev_gray.shape
    memsize = cfg.roi.memsize
    tp = np.zeros((h // memsize, w // memsize), np.uint8)
    tp[mem2 >= cfg.roi.thres] = 255
    n, lab, stats, _ = cv2.connectedComponentsWithStats(tp, connectivity=4)
    flow = np.zeros((h, w, 2), np.float32)
    if n == 1:
        return np.zeros((h, w), np.uint8), None
    x_min = min(stats[i, cv2.CC_STAT_LEFT] for i in range(1, n))
    y_min = min(stats[i, cv2.CC_STAT_TOP] for i in range(1, n))
    x_max = max(
        stats[i, cv2.CC_STAT_LEFT] + stats[i, cv2.CC_STAT_WIDTH]
        for i in range(1, n)
    )
    y_max = max(
        stats[i, cv2.CC_STAT_TOP] + stats[i, cv2.CC_STAT_HEIGHT]
        for i in range(1, n)
    )
    x0 = max(x_min * memsize - cfg.roi.extend_left, 0)
    y0 = max(y_min * memsize - cfg.roi.extend_up, 0)
    x1 = min(x_max * memsize + cfg.roi.extend_right, w)
    y1 = min(y_max * memsize + cfg.roi.extend_down, h)
    prev_r = prev_gray[y0:y1, x0:x1]
    next_r = next_gray[y0:y1, x0:x1]
    fb = cfg.fb
    cur = cv2.calcOpticalFlowFarneback(
        prev_r, next_r, None, fb.pyr_scale, fb.levels, fb.winsize,
        fb.iterations, fb.poly_n, fb.poly_sigma, 0,
    )
    flow[y0:y1, x0:x1] = cur
    flow = -flow

    motion_binary = np.zeros((h, w), np.uint8)
    fr = flow[y0:y1, x0:x1]
    mag, _ = cv2.cartToPolar(
        fr[..., 0].astype(np.float64), fr[..., 1].astype(np.float64)
    )
    mask = np.zeros(mag.shape, np.uint8)
    mask[mag > cfg.head.seg_th] = 255
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (10, 10))
    for _ in range(5):
        mask = cv2.dilate(mask, k)
        mask = cv2.erode(mask, k)
    _, mb = cv2.threshold(mask, 1, 255, cv2.THRESH_BINARY)
    motion_binary[y0:y1, x0:x1] = mb
    return motion_binary, (x0, y0, x1, y1)


@pytest.mark.slow
def test_seg_pipeline_matches_reference(tt_scene):
    from nsof_tpu.pipelines.segmentation import seg_step

    cfg = tt_scene.cfg
    agree = []
    for i in range(tt_scene.num_pairs):
        mem2, prev, nxt = tt_scene.pair_inputs(i)
        ref_mask, ref_box = _reference_seg_pair(mem2, prev, nxt, cfg)
        out = seg_step(mem2, prev, nxt, cfg)
        got_mask = np.asarray(out["mask"])
        if ref_box is None:
            assert not bool(out["any_active"])
            assert got_mask.sum() == 0
            continue
        assert tuple(np.asarray(out["box"])) == ref_box
        # mask agreement: flows differ at cv2's anomalous right/bottom
        # border band, so allow a small pixel disagreement fraction
        agree.append((got_mask == ref_mask).mean())
    assert np.mean(agree) > 0.98, f"mask agreement {np.mean(agree)}"


@pytest.mark.slow
def test_seg_batch_runner(tt_scene):
    from nsof_tpu.pipelines.runner import run_segmentation

    res = run_segmentation(tt_scene)
    n = tt_scene.num_pairs
    assert res.masks.shape == (n, 160, 160)
    assert res.masks_full.shape == (n, 160, 160)
    assert set(np.unique(res.masks)) <= {0, 255}
    if tt_scene.gt_masks is not None:
        assert res.metrics["mem_pa_mean"] > 50.0


@pytest.mark.slow
def test_tracking_pipeline_boxes(tt_scene):
    from nsof_tpu.pipelines.runner import run_tracking

    res = run_tracking(tt_scene)
    assert res.boxes.shape[-1] == 4
    # at least some frames should produce a detection on this scene
    assert res.boxes_valid.any()
    if tt_scene.gt_masks is not None:
        assert res.metrics["mean_iou"] >= 0.0


@pytest.mark.slow
def test_prediction_pipeline_ssim(tt_scene):
    from nsof_tpu.pipelines.runner import run_prediction

    res = run_prediction(tt_scene)
    assert res.preds.shape[0] == tt_scene.num_pairs
    # warping by estimated flow should stay similar to the true future frame
    assert res.metrics["mean_ssim"] > 0.5


@pytest.mark.slow
def test_prediction_matches_reference_warp(tt_scene):
    """Single-pair golden test of the warp head vs cv2.remap."""
    from nsof_tpu.pipelines.prediction import prediction_step

    cfg = tt_scene.cfg
    i = 5
    mem2, prev, nxt = tt_scene.pair_inputs(i)
    out = prediction_step(mem2, prev, nxt, tt_scene.frames_bgr[i + 1], cfg)
    if not bool(out["any_active"]):
        pytest.skip("no ROI on this pair")
    x0, y0, x1, y1 = np.asarray(out["box"])
    flow = np.asarray(out["flow"])
    nf = tt_scene.frames_bgr[i + 1]
    h, w = nf.shape[:2]
    region_h, region_w = y1 - y0, x1 - x0
    x_coords = np.tile(np.arange(x0, x1), region_h)
    y_coords = np.repeat(np.arange(y0, y1), region_w)
    flow_map = (
        np.column_stack((x_coords, y_coords))
        + flow[y0:y1, x0:x1].reshape(-1, 2)
    ).reshape(region_h, region_w, 2).astype(np.float32)
    ref_region = np.stack(
        [
            cv2.remap(
                nf[:, :, c], flow_map[..., 0], flow_map[..., 1],
                cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE,
            )
            for c in range(3)
        ],
        axis=-1,
    )
    got_region = np.asarray(out["pred"])[y0:y1, x0:x1]
    diff = np.abs(got_region.astype(int) - ref_region.astype(int))
    assert diff.mean() < 1.0
    assert (diff <= 4).mean() > 0.99


def _reference_tracking_head(flow_win, inbox, origin_yx, seg_th):
    """cv2/numpy transliteration of process_flow_region_tracking + NMS
    (optical_flow_ob.py:321-379, 96-135) on a GIVEN flow window — isolates
    the head from the flow backend."""
    fl = np.where(inbox[..., None], np.asarray(flow_win), 0.0)
    mag, ang = cv2.cartToPolar(
        fl[..., 0].astype(np.float64), fl[..., 1].astype(np.float64)
    )
    hsv = np.zeros((*mag.shape, 3), np.uint8)
    hsv[..., 1] = 255
    hsv[..., 0] = ang * 180 / np.pi / 2
    big = np.where(inbox, mag, np.nan)
    mn, mx = np.nanmin(big), np.nanmax(big)
    scale = 255.0 / (mx - mn) if mx - mn > 1e-12 else 0.0
    hsv[..., 2] = np.clip((mag - mn) * scale, 0, 255).astype(np.uint8)
    hsv[..., 2] = np.where(inbox, hsv[..., 2], 0)
    bgr = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    draw = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    draw = np.where(inbox, draw, 0).astype(np.uint8)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    draw = cv2.morphologyEx(draw, cv2.MORPH_CLOSE, k)
    _, draw = cv2.threshold(draw, seg_th, 255, cv2.THRESH_BINARY)
    contours, _ = cv2.findContours(
        draw.copy(), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    oy, ox = origin_yx
    boxes = []
    for c in contours:
        if cv2.contourArea(c) < 500:
            continue
        x, y, w, h = cv2.boundingRect(c)
        boxes.append([x + ox, y + oy, x + w + ox, y + h + oy,
                      cv2.contourArea(c)])
    boxes = np.array(boxes)
    if boxes.ndim != 2 or boxes.shape[0] == 0:
        return np.zeros((0, 4))
    order = boxes[:, 4].argsort()[::-1]
    boxes = boxes[order]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (y2 - y1 + 1) * (x2 - x1 + 1)
    idx = boxes[:, 4].argsort()[::-1]
    keep = []
    while idx.size > 0:
        i = idx[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[idx[1:]])
        yy1 = np.maximum(y1[i], y1[idx[1:]])
        xx2 = np.minimum(x2[i], x2[idx[1:]])
        yy2 = np.minimum(y2[i], y2[idx[1:]])
        w = np.maximum(0, xx2 - xx1 + 1)
        h = np.maximum(0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[idx[1:]] - inter)
        idx = idx[1:][iou <= 0.2]
    return boxes[keep][:, :4]


@pytest.mark.slow
def test_tracking_head_matches_reference(tt_scene):
    """Our tracking head vs the cv2 transliteration on the SAME flow
    input; boxes compared by best-match IoU (contourArea-vs-pixel-count
    divergence near the 500 px² cutoff is documented in the module)."""
    import jax.numpy as jnp

    from nsof_tpu.ops import roi as roi_ops
    from nsof_tpu.pipelines.segmentation import roi_stages
    from nsof_tpu.pipelines.tracking import tracking_head_window

    cfg = tt_scene.cfg
    st = roi_stages(cfg)
    matched, total = 0, 0
    for i in range(tt_scene.num_pairs):
        mem2, prev, nxt = tt_scene.pair_inputs(i)
        roi = st["cal"](mem2)
        flow_win, inbox = st["vel"](
            jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(mem2), roi
        )
        out = tracking_head_window(
            flow_win, inbox, (roi["origin"][0], roi["origin"][1]), cfg
        )
        got = np.asarray(out["boxes"])[np.asarray(out["valid"])]
        oy, ox = int(roi["origin"][0]), int(roi["origin"][1])
        ref = _reference_tracking_head(
            flow_win, np.asarray(inbox), (oy, ox), cfg.head.seg_th
        )
        total += len(ref)
        for rb in ref:
            if len(got) == 0:
                continue
            xx1 = np.maximum(got[:, 0], rb[0])
            yy1 = np.maximum(got[:, 1], rb[1])
            xx2 = np.minimum(got[:, 2], rb[2])
            yy2 = np.minimum(got[:, 3], rb[3])
            inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
            a1 = (got[:, 2] - got[:, 0]) * (got[:, 3] - got[:, 1])
            a2 = (rb[2] - rb[0]) * (rb[3] - rb[1])
            iou = inter / np.maximum(a1 + a2 - inter, 1e-9)
            if iou.max() > 0.8:
                matched += 1
    assert total > 0
    assert matched / total > 0.85, f"matched {matched}/{total}"
