"""Native YOLOv8 tests: converter structure, torch forward parity,
DFL decode, NMS post, Detector-protocol integration.

No checkpoint ships with the reference (`yolov8n.pt` is a missing large
blob, .MISSING_LARGE_BLOBS:1) and ultralytics is not installed, so parity
is validated against an independent torch transliteration of the public
YOLOv8 graph driven by the SAME synthetic ultralytics-schema state_dict
the converter consumes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nsof_tpu.models.yolov8 import (
    REG_MAX,
    YOLOv8,
    YoloConfig,
    convert_yolov8,
    decode_predictions,
    postprocess,
    synthetic_state_dict,
)

CFG = YoloConfig("n")


@pytest.fixture(scope="module")
def converted():
    state = synthetic_state_dict(CFG, seed=3)
    return state, convert_yolov8(state, CFG)


@pytest.mark.slow
def test_conversion_matches_init_tree(converted):
    _, params = converted
    model = YOLOv8(CFG)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), x)
    import jax.tree_util as jtu

    pi = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(init)}
    pc = {
        jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(params)
    }
    assert pi == pc


def test_conversion_rejects_bad_dfl(converted):
    state, _ = converted
    bad = dict(state)
    bad["model.22.dfl.conv.weight"] = np.ones(
        (1, REG_MAX, 1, 1), np.float32
    )
    with pytest.raises(ValueError):
        convert_yolov8(bad, CFG)


def _torch_forward(state, x_nchw):
    """Independent torch transliteration of the YOLOv8 graph (public
    ultralytics architecture), run in eval mode from the raw state_dict —
    the parity oracle for the flax model + BN-folding converter."""
    import torch
    import torch.nn.functional as F

    t = {k[len("model."):]: torch.tensor(np.asarray(v))
         for k, v in state.items()}

    def conv(x, p, s=1):
        w = t[f"{p}.conv.weight"]
        x = F.conv2d(x, w, stride=s, padding=w.shape[-1] // 2)
        x = F.batch_norm(
            x, t[f"{p}.bn.running_mean"], t[f"{p}.bn.running_var"],
            t[f"{p}.bn.weight"], t[f"{p}.bn.bias"], False, 0.0, 1e-3,
        )
        return F.silu(x)

    def c2f(x, p, n, shortcut):
        y = conv(x, f"{p}.cv1")
        c = y.shape[1] // 2
        parts = [y[:, :c], y[:, c:]]
        for i in range(n):
            h = conv(parts[-1], f"{p}.m.{i}.cv1")
            h = conv(h, f"{p}.m.{i}.cv2")
            parts.append(parts[-1] + h if shortcut else h)
        return conv(torch.cat(parts, 1), f"{p}.cv2")

    def sppf(x, p):
        y = conv(x, f"{p}.cv1")
        pools = [y]
        for _ in range(3):
            pools.append(F.max_pool2d(pools[-1], 5, 1, 2))
        return conv(torch.cat(pools, 1), f"{p}.cv2")

    n3, n6 = CFG.n_rep(3), CFG.n_rep(6)
    x = torch.tensor(x_nchw)
    x = conv(x, "0", 2)
    x = conv(x, "1", 2)
    x = c2f(x, "2", n3, True)
    x = conv(x, "3", 2)
    p3 = c2f(x, "4", n6, True)
    x = conv(p3, "5", 2)
    p4 = c2f(x, "6", n6, True)
    x = conv(p4, "7", 2)
    x = c2f(x, "8", n3, True)
    p5 = sppf(x, "9")
    up = torch.nn.Upsample(scale_factor=2, mode="nearest")
    h4 = c2f(torch.cat([up(p5), p4], 1), "12", n3, False)
    h3 = c2f(torch.cat([up(h4), p3], 1), "15", n3, False)
    x = conv(h3, "16", 2)
    n4 = c2f(torch.cat([x, h4], 1), "18", n3, False)
    x = conv(n4, "19", 2)
    n5 = c2f(torch.cat([x, p5], 1), "21", n3, False)

    outs = []
    for s, f in enumerate((h3, n4, n5)):
        box = conv(f, f"22.cv2.{s}.0")
        box = conv(box, f"22.cv2.{s}.1")
        box = F.conv2d(box, t[f"22.cv2.{s}.2.weight"],
                       t[f"22.cv2.{s}.2.bias"])
        cls = conv(f, f"22.cv3.{s}.0")
        cls = conv(cls, f"22.cv3.{s}.1")
        cls = F.conv2d(cls, t[f"22.cv3.{s}.2.weight"],
                       t[f"22.cv3.{s}.2.bias"])
        outs.append(torch.cat([box, cls], 1).numpy())
    return outs


def test_torch_forward_parity(converted):
    state, params = converted
    rng = np.random.default_rng(0)
    x = rng.random((1, 96, 128, 3)).astype(np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        ours = YOLOv8(CFG).apply(params, jnp.asarray(x))
    torch_outs = _torch_forward(state, x.transpose(0, 3, 1, 2))
    for o, ref in zip(ours, torch_outs):
        ref_nhwc = ref.transpose(0, 2, 3, 1)
        assert o.shape == ref_nhwc.shape
        np.testing.assert_allclose(
            np.asarray(o), ref_nhwc, rtol=2e-4, atol=2e-4
        )


def test_decode_dfl_expectation():
    """One-hot DFL bin k → decoded distance k from the anchor centre."""
    h, w, nc = 2, 2, 80
    raw = np.full((1, h, w, 4 * REG_MAX + nc), -40.0, np.float32)
    # cell (0,0): l=2, t=1, r=3, b=0 (one-hot logits at those bins)
    for side, k in enumerate((2, 1, 3, 0)):
        raw[0, 0, 0, side * REG_MAX + k] = 40.0
    boxes, scores = decode_predictions([jnp.asarray(raw)], nc, strides=(8,))
    bx = np.asarray(boxes)[0, 0]
    # centre (0.5, 0.5) → xyxy = (0.5-2, 0.5-1, 0.5+3, 0.5+0) * 8
    np.testing.assert_allclose(bx, [-12.0, -4.0, 28.0, 4.0], atol=1e-3)
    assert scores.shape == (1, h * w, nc)


def test_postprocess_class_aware_nms():
    boxes = jnp.asarray(
        [[[0, 0, 10, 10], [1, 1, 11, 11], [0, 0, 10, 10],
          [50, 50, 60, 60]]],
        jnp.float32,
    )
    scores = np.zeros((1, 4, 3), np.float32)
    scores[0, 0, 0] = 0.9   # class 0, kept
    scores[0, 1, 0] = 0.8   # class 0, overlaps 0 → suppressed
    scores[0, 2, 1] = 0.7   # class 1, same box → kept (class-aware)
    scores[0, 3, 2] = 0.6   # far away → kept
    post = postprocess(boxes, jnp.asarray(scores), conf=0.25, iou=0.45,
                       max_det=4)
    valid = np.asarray(post["valid"][0])
    kept_scores = sorted(np.asarray(post["scores"][0])[valid].tolist())
    assert valid.sum() == 3
    np.testing.assert_allclose(kept_scores, [0.6, 0.7, 0.9], atol=1e-6)


def test_jax_yolo_detector_protocol():
    from nsof_tpu.pipelines.detection import JaxYoloDetector

    state = synthetic_state_dict(CFG, seed=1)
    det = JaxYoloDetector(
        convert_yolov8(state, CFG), CFG, imgsz=160, conf=0.01
    )
    img = (np.random.default_rng(2).random((120, 90, 3)) * 255).astype(
        np.uint8
    )
    out = det(img)
    assert isinstance(out, list)
    for d in out:
        x1, y1, x2, y2 = d.bbox
        assert 0 <= x1 <= 90 and 0 <= x2 <= 90
        assert 0 <= y1 <= 120 and 0 <= y2 <= 120
        assert 0 <= d.class_id < 80 and d.class_name
