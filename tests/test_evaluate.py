"""End-to-end exercise of the benchmark evaluation/submission path
(train/evaluate.py ↔ codebase/RAFT/evaluate.py:21-197) on synthetic
Sintel/KITTI-layout splits with known ground truth.

The flow backend is the exact Farnebäck op (oracle-tested elsewhere to
recover translations), so validate_pairs' EPE is a real end-to-end check
of scan → imread → pad/unpad → flow → metric, not a stub test.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp  # noqa: E402

from nsof_tpu.data import flow_datasets as fd  # noqa: E402
from nsof_tpu.train import evaluate as ev  # noqa: E402


def _textured(rng, h, w):
    img = rng.integers(40, 200, (h, w), np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 1.5)
    return np.stack([img] * 3, -1)


def _make_sintel_training(root, rng, shift=(2, 1), n_frames=3, hw=(96, 128)):
    h, w = hw
    scene = root / "training" / "clean" / "alley_1"
    fdir = root / "training" / "flow" / "alley_1"
    scene.mkdir(parents=True)
    fdir.mkdir(parents=True)
    base = _textured(rng, h + 32, w + 32)
    for i in range(n_frames):
        crop = base[16 - i * shift[1] : 16 - i * shift[1] + h,
                    16 - i * shift[0] : 16 - i * shift[0] + w]
        cv2.imwrite(str(scene / f"frame_{i:04d}.png"), crop)
    gt = np.zeros((h, w, 2), np.float32)
    gt[..., 0], gt[..., 1] = shift
    for i in range(1, n_frames):
        fd.write_flo(fdir / f"frame_{i:04d}.flo", gt)
    return gt


def _farneback_flow_fn():
    from nsof_tpu.ops.farneback import FarnebackParams, farneback

    params = FarnebackParams(winsize=15, levels=3)

    def fn(i1, i2):
        g1 = jnp.asarray(cv2.cvtColor(np.asarray(i1[0], np.uint8),
                                      cv2.COLOR_RGB2GRAY))
        g2 = jnp.asarray(cv2.cvtColor(np.asarray(i2[0], np.uint8),
                                      cv2.COLOR_RGB2GRAY))
        return np.asarray(farneback(g1, g2, params))[None]

    return fn


def test_validate_pairs_on_synthetic_sintel(tmp_path):
    rng = np.random.default_rng(5)
    _make_sintel_training(tmp_path, rng)
    pairs = fd.scan_sintel(tmp_path)
    assert len(pairs) == 2 and all(p.flow_path for p in pairs)

    metrics = ev.validate_pairs(_farneback_flow_fn(), pairs)
    assert metrics["n"] == 2
    # constant (2, 1)px shift with texture: Farnebäck recovers it well
    assert metrics["epe"] < 0.5, metrics
    assert metrics["f1"] < 20.0, metrics


def test_sintel_submission_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    scene = tmp_path / "test" / "clean" / "market_2"
    scene.mkdir(parents=True)
    for i in range(3):
        cv2.imwrite(str(scene / f"frame_{i:04d}.png"),
                    _textured(rng, 64, 96))

    def const_flow(i1, i2):
        b, h, w, _ = i1.shape
        out = np.zeros((b, h, w, 2), np.float32)
        out[..., 0] = 3.0
        out[..., 1] = -1.5
        return out

    n = ev.create_sintel_submission(const_flow, tmp_path, tmp_path / "sub")
    assert n == 2
    flo = sorted((tmp_path / "sub" / "clean" / "market_2").glob("*.flo"))
    assert len(flo) == 2
    flow, valid = fd.read_flow_any(flo[0])
    assert valid is None
    np.testing.assert_allclose(flow[..., 0], 3.0)
    np.testing.assert_allclose(flow[..., 1], -1.5)


def test_kitti_submission_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    img_dir = tmp_path / "testing" / "image_2"
    img_dir.mkdir(parents=True)
    for i in range(2):
        cv2.imwrite(str(img_dir / f"{i:06d}_10.png"), _textured(rng, 64, 96))
        cv2.imwrite(str(img_dir / f"{i:06d}_11.png"), _textured(rng, 64, 96))

    def const_flow(i1, i2):
        b, h, w, _ = i1.shape
        out = np.zeros((b, h, w, 2), np.float32)
        out[..., 0] = -2.0
        out[..., 1] = 4.0
        return out

    n = ev.create_kitti_submission(const_flow, tmp_path, tmp_path / "subk")
    assert n == 2
    pngs = sorted((tmp_path / "subk").glob("*.png"))
    assert len(pngs) == 2
    flow, valid = fd.read_flow_any(pngs[0])
    assert valid is not None and valid.all()
    # KITTI png stores 1/64px quantization
    np.testing.assert_allclose(flow[..., 0], -2.0, atol=1 / 64)
    np.testing.assert_allclose(flow[..., 1], 4.0, atol=1 / 64)
