"""Connected components / stats / NMS parity vs OpenCV and numpy."""

import cv2
import numpy as np
import pytest

from nsof_tpu.ops import components as C


def _random_blobs(rng, h, w, n_blobs):
    img = np.zeros((h, w), np.uint8)
    for _ in range(n_blobs):
        cy, cx = rng.integers(0, h), rng.integers(0, w)
        r = rng.integers(2, max(h, w) // 4)
        yy, xx = np.ogrid[:h, :w]
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 255
    return img


@pytest.mark.parametrize("connectivity", [4, 8])
def test_labels_partition_matches_cv2(rng, connectivity):
    for trial in range(5):
        img = _random_blobs(rng, 40, 56, 4)
        ref_n, ref_lab = cv2.connectedComponents(img, connectivity=connectivity)
        ours = np.asarray(C.label_components(img, connectivity))
        # same number of components
        ours_ids = np.unique(ours[ours >= 0])
        assert len(ours_ids) == ref_n - 1
        # identical partition: each of our ids maps to exactly one cv2 id
        for i in ours_ids:
            assert len(np.unique(ref_lab[ours == i])) == 1
        for i in range(1, ref_n):
            assert len(np.unique(ours[ref_lab == i])) == 1


def test_component_stats_match_cv2(rng):
    img = _random_blobs(rng, 48, 48, 3)
    n, lab, stats, _ = cv2.connectedComponentsWithStats(img, connectivity=4)
    out = C.connected_components_with_stats(img, 4, k_max=8)
    assert int(out["count"]) == n - 1
    ref = {
        tuple(stats[i][:4]): stats[i][4] for i in range(1, n)
    }  # (x,y,w,h) → area
    got = {
        tuple(np.asarray(out["boxes"][i])): int(out["areas"][i])
        for i in range(int(out["count"]))
    }
    assert got == ref


def test_nms_matches_reference_py_cpu_nms(rng):
    def py_cpu_nms(dets, thresh):
        x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
        areas = (y2 - y1 + 1) * (x2 - x1 + 1)
        scores = dets[:, 4]
        keep = []
        index = scores.argsort()[::-1]
        while index.size > 0:
            i = index[0]
            keep.append(i)
            x11 = np.maximum(x1[i], x1[index[1:]])
            y11 = np.maximum(y1[i], y1[index[1:]])
            x22 = np.minimum(x2[i], x2[index[1:]])
            y22 = np.minimum(y2[i], y2[index[1:]])
            w = np.maximum(0, x22 - x11 + 1)
            h = np.maximum(0, y22 - y11 + 1)
            overlaps = w * h
            ious = overlaps / (areas[i] + areas[index[1:]] - overlaps)
            idx = np.where(ious <= thresh)[0]
            index = index[idx + 1]
        return sorted(keep)

    for _ in range(10):
        n = 12
        xy = rng.random((n, 2)) * 60
        wh = rng.random((n, 2)) * 30 + 2
        scores = rng.random(n) * 100
        dets = np.concatenate([xy, xy + wh, scores[:, None]], axis=1)
        ref_keep = py_cpu_nms(dets, 0.2)
        keep_mask = np.asarray(
            C.nms(dets[:, :4], dets[:, 4], np.ones(n, bool), 0.2)
        )
        assert sorted(np.where(keep_mask)[0].tolist()) == ref_keep


def test_box_iou():
    a = np.array([0, 0, 10, 10], np.float32)
    b = np.array([5, 5, 15, 15], np.float32)
    got = float(C.box_iou(a, b))
    assert got == pytest.approx(25 / 175, abs=1e-6)
