"""ROI extraction tests vs a numpy transliteration of the reference chain."""

import cv2
import numpy as np
import pytest

from nsof_tpu.ops import roi as R
from tests.conftest import REFERENCE_DATA, requires_reference_data


def _reference_roi(mem_u8, h, w, cfg: R.RoiConfig):
    """Direct port of opticalFlow3D's region logic
    (optical_flow_seg.py:211-252) as oracle."""
    tp = np.zeros(
        (int(h / cfg.memsize), int(w / cfg.memsize)), np.uint8
    )
    tp[mem_u8 >= cfg.thres] = 255
    n, lab, stats, _ = cv2.connectedComponentsWithStats(
        tp, connectivity=cfg.connectivity
    )
    if n == 1:
        return None, []
    boxes = []
    for i in range(1, n):
        x, y, a, b = (
            stats[i, cv2.CC_STAT_LEFT],
            stats[i, cv2.CC_STAT_TOP],
            stats[i, cv2.CC_STAT_WIDTH],
            stats[i, cv2.CC_STAT_HEIGHT],
        )
        x0 = max(x * cfg.memsize - cfg.extend_left, 0)
        y0 = max(y * cfg.memsize - cfg.extend_up, 0)
        x1 = min((x + a) * cfg.memsize + cfg.extend_right, w)
        y1 = min((y + b) * cfg.memsize + cfg.extend_down, h)
        boxes.append((x0, y0, x1, y1))
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
    merged = (
        max(x_min * cfg.memsize - cfg.extend_left, 0),
        max(y_min * cfg.memsize - cfg.extend_up, 0),
        min(x_max * cfg.memsize + cfg.extend_right, w),
        min(y_max * cfg.memsize + cfg.extend_down, h),
    )
    return merged, boxes


def test_roi_boxes_match_reference_oracle(rng):
    cfg = R.RoiConfig(memsize=10, thres=200, k_max=256)
    h, w = 160, 160
    for _ in range(10):
        mem = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        ref_merged, ref_boxes = _reference_roi(mem, h, w, cfg)
        out = R.roi_boxes(mem, h, w, cfg)
        if ref_merged is None:
            assert not bool(out["any_active"])
            continue
        assert bool(out["any_active"])
        np.testing.assert_array_equal(np.asarray(out["merged"]), ref_merged)
        got_boxes = {
            tuple(np.asarray(out["boxes"][i]))
            for i in range(cfg.k_max)
            if bool(out["valid"][i])
        }
        assert got_boxes == set(ref_boxes)


def test_no_active_region_early_exit():
    cfg = R.RoiConfig(memsize=10, thres=250)
    mem = np.zeros((16, 16), np.uint8)
    out = R.roi_boxes(mem, 160, 160, cfg)
    assert not bool(out["any_active"])
    np.testing.assert_array_equal(np.asarray(out["merged"]), [0, 0, 0, 0])


def test_crop_scatter_roundtrip(rng):
    img = rng.random((64, 64, 2)).astype(np.float32)
    box = np.asarray([10, 20, 40, 50])  # x0,y0,x1,y1
    origin = R.window_origin(box, 48, 48, 64, 64)
    win = R.crop_window(img, origin, 48, 48)
    full = np.array(R.scatter_window(np.zeros_like(img), win, box, origin))
    # inside box: original values; outside: zeros
    np.testing.assert_allclose(full[20:50, 10:40], img[20:50, 10:40])
    full[20:50, 10:40] = 0
    np.testing.assert_allclose(full, 0)


def test_region_percentage():
    box = np.asarray([0, 0, 80, 80])
    pct = float(R.region_percentage(box, 160, 160))
    assert pct == pytest.approx(25.0)


@requires_reference_data
def test_grasp_mat_rois_nonempty():
    import scipy.io

    mat = scipy.io.loadmat(
        str(REFERENCE_DATA / "grasp" / "constructed_3D_matrix.mat")
    )["constructed3DMatrix"]
    from nsof_tpu.device.model import conductance_to_gray

    cfg = R.RoiConfig(memsize=80, thres=250)
    active_frames = 0
    for t in range(0, mat.shape[2], 10):
        mem = np.asarray(conductance_to_gray(mat[:, :, t]))
        out = R.roi_boxes(mem, 1920, 1080, cfg)
        if bool(out["any_active"]):
            active_frames += 1
            x0, y0, x1, y1 = np.asarray(out["merged"])
            assert 0 <= x0 < x1 <= 1080
            assert 0 <= y0 < y1 <= 1920
    assert active_frames > 0
