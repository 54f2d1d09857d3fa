"""Canny ROI variant (default_ptm.py:44-80) vs cv2 oracles."""

import numpy as np
import pytest

from tests.conftest import REFERENCE_DATA, reference_data_available

cv2 = pytest.importorskip("cv2")


def _grids():
    rng = np.random.default_rng(3)
    out = []
    # blocky binary transition grids — the only inputs this gate sees
    for shape in [(16, 16), (24, 13), (15, 15)]:
        for density in (0.1, 0.3, 0.6):
            g = (rng.random(shape) < density).astype(np.uint8) * 255
            out.append(g)
    # structured: box, L-shape, two blobs
    g = np.zeros((20, 20), np.uint8); g[4:9, 5:12] = 255; out.append(g)
    g = np.zeros((20, 20), np.uint8)
    g[3:15, 3:6] = 255; g[12:15, 3:14] = 255; out.append(g)
    g = np.zeros((16, 24), np.uint8)
    g[2:6, 2:7] = 255; g[9:14, 15:21] = 255; out.append(g)
    if reference_data_available():
        import scipy.io as sio

        for scene, key in [("tabletennis", "tabletennis"), ("uavnew2", "uavnew2")]:
            mat = sio.loadmat(
                REFERENCE_DATA / scene / "constructed_3D_matrix.mat"
            )["constructed3DMatrix"]
            for t in range(0, mat.shape[2], max(1, mat.shape[2] // 4)):
                g = np.clip(
                    -3366 / np.log10(np.abs(mat[:, :, t]) + 1e-30) - 306,
                    0, 255,
                ).astype(np.uint8)
                out.append(np.where(g > 128, 255, 0).astype(np.uint8))
    return out


def test_canny_edges_match_cv2():
    from nsof_tpu.ops.canny import canny_edges

    mismatches = []
    for i, g in enumerate(_grids()):
        want = cv2.Canny(g, 128, 256) > 0
        got = np.asarray(canny_edges(g.astype(np.float32)))
        if not (got == want).all():
            mismatches.append((i, int((got != want).sum())))
    assert not mismatches, mismatches


def test_canny_roi_boxes_match_reference_transliteration():
    """Box-set parity with default_ptm.py:59-80: Canny → external
    contours → boundingRect, ±1-cell extend, pixel scaling + clamp."""
    from nsof_tpu.ops.canny import canny_roi_boxes

    cell = 10
    for g in _grids():
        gh, gw = g.shape
        ih, iw = gh * cell, gw * cell
        # reference path
        edges = cv2.Canny(g, 128, 256)
        contours, _ = cv2.findContours(
            edges, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        want = set()
        for cnt in contours:
            x, y, a, b = cv2.boundingRect(cnt)
            want.add((
                int(np.clip((x - 1) * cell, 0, iw - 1)),
                int(np.clip((y - 1) * cell, 0, ih - 1)),
                int(np.clip((x + a + 1) * cell, 0, iw - 1)),
                int(np.clip((y + b + 1) * cell, 0, ih - 1)),
            ))
        out = canny_roi_boxes(g, ih, iw, cell, cell, k_max=32)
        valid = np.asarray(out["valid"])
        got = {
            tuple(int(v) for v in row)
            for row in np.asarray(out["boxes"])[valid]
        }
        # RETR_EXTERNAL merges nothing: nested inner contours (holes) are
        # dropped by cv2 but kept as the same outer bbox by CC — compare
        # the union coverage instead of exact multiplicity
        assert got == want, (got, want, g.tolist())


def test_transition_from_mem():
    from nsof_tpu.ops.canny import transition_from_mem

    mem = np.full((40, 60), 255, np.uint8)
    mem[10:20, 30:40] = 100  # active block
    t = np.asarray(transition_from_mem(mem, 4, 6, 10, 10))
    want = np.zeros((4, 6), np.uint8)
    want[1, 3] = 255
    assert (t == want).all()
