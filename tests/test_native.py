"""Native C++ component tests: the event binner must match the numpy
reference bit-for-bit (and the GT-tooling stand-ins must behave)."""

import numpy as np
import pytest

from nsof_tpu.device.event_sim import bin_events
from nsof_tpu.device.synthetic import generate_synthetic_events
from nsof_tpu.native import native_available


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_binner_matches_numpy():
    x, y, p, t = generate_synthetic_events(
        height=48, width=64, box_h=12, box_w=12, duration_s=0.3
    )
    a = bin_events(x, y, p, t, slice_us=1000, use_native=True)
    b = bin_events(x, y, p, t, slice_us=1000, use_native=False)
    np.testing.assert_array_equal(a.counts, b.counts)
    np.testing.assert_array_equal(a.on_any, b.on_any)
    np.testing.assert_array_equal(a.off_any, b.off_any)
    np.testing.assert_array_equal(a.t_first, b.t_first)
    np.testing.assert_array_equal(a.t_last, b.t_last)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_binner_boundary_and_polarity():
    x = np.array([1, 2, 3, 0])
    y = np.array([1, 1, 2, 0])
    p = np.array([1, 0, -1, 1])
    t = np.array([100, 999, 1099, 1100])  # rebased: 0, 899, 999, 1000
    a = bin_events(x, y, p, t, slice_us=500, height=4, width=4,
                   use_native=True)
    b = bin_events(x, y, p, t, slice_us=500, height=4, width=4,
                   use_native=False)
    np.testing.assert_array_equal(a.counts, b.counts)
    np.testing.assert_array_equal(a.t_first, b.t_first)
    np.testing.assert_array_equal(a.t_last, b.t_last)
    assert a.counts.shape[0] == 2  # final boundary event dropped


def test_gt_tooling_brightness_segmenter(tmp_path):
    import cv2

    from nsof_tpu.data.gt_tooling import BrightnessSegmenter, generate_gt_masks

    img_dir = tmp_path / "RGB"
    img_dir.mkdir()
    names = []
    for i, bright in enumerate([True, False]):
        img = np.zeros((32, 32, 3), np.uint8)
        if bright:
            img[8:20, 8:20] = 255
        name = f"{i+1}.jpg"
        cv2.imwrite(str(img_dir / name), img)
        names.append(name)
    (tmp_path / "imgs.txt").write_text("\n".join(names))

    res = generate_gt_masks(
        img_dir, tmp_path / "imgs.txt", tmp_path / "gtmask",
        "bright object", BrightnessSegmenter(thresh=128, min_area=10),
    )
    assert len(res) == 2
    m0 = cv2.imread(res[0].mask_path, cv2.IMREAD_GRAYSCALE)
    m1 = cv2.imread(res[1].mask_path, cv2.IMREAD_GRAYSCALE)
    assert (m0 > 0).sum() > 100  # bright square found
    assert (m1 > 0).sum() == 0  # black frame → all-black mask


def test_gt_tooling_box_proposer_stage(tmp_path):
    """Text→boxes grounding stage ahead of the mask predictor
    (lang_sam.py:91-123's predict_dino→predict_sam split), exercised
    weightless with the brightness stand-ins."""
    import cv2

    from nsof_tpu.data.gt_tooling import (
        BrightnessBoxProposer,
        generate_gt_masks,
    )

    img = np.zeros((40, 48, 3), np.uint8)
    img[10:20, 12:30] = 255
    boxes = BrightnessBoxProposer(thresh=128, min_area=10)(
        img, "bright object"
    )
    assert boxes == [[12.0, 10.0, 30.0, 20.0]]
    assert BrightnessBoxProposer()(img, "dark thing") != []  # polarity

    # box-driven segmenter: masks are the proposed boxes (the SAM slot,
    # substituted weightless so the chain runs offline)
    class BoxFillSegmenter:
        def __init__(self, proposer):
            self.proposer = proposer

        def __call__(self, image_rgb, text_prompt):
            out = []
            for x0, y0, x1, y1 in self.proposer(image_rgb, text_prompt):
                m = np.zeros(image_rgb.shape[:2], bool)
                m[int(y0):int(y1), int(x0):int(x1)] = True
                out.append(m)
            return out

    img_dir = tmp_path / "RGB"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "1.png"), img)
    (tmp_path / "imgs.txt").write_text("1.png")
    res = generate_gt_masks(
        img_dir, tmp_path / "imgs.txt", tmp_path / "gtmask",
        "bright object",
        BoxFillSegmenter(BrightnessBoxProposer(thresh=128, min_area=10)),
    )
    m = cv2.imread(res[0].mask_path, cv2.IMREAD_GRAYSCALE)
    assert (m[10:20, 12:30] > 0).all() and (m > 0).sum() == 10 * 18


def test_gt_tooling_lang_sam_chain_structure(monkeypatch):
    """lang_sam_segmenter wires OWL-ViT→SAM; without local weights the
    constructor raising (offline) is acceptable — the chain structure is
    what's under test.  HF_HUB_OFFLINE makes the no-cache case fail fast
    instead of waiting out connection retries."""
    import pytest

    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.setenv("TRANSFORMERS_OFFLINE", "1")
    from nsof_tpu.data import gt_tooling as gt

    try:
        seg = gt.lang_sam_segmenter()
    except Exception:
        pytest.skip("pretrained OWL-ViT/SAM weights not cached locally")
    assert isinstance(seg.box_proposer, gt.FlaxOwlVitBoxProposer)
