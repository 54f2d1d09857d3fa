"""Benchmark evaluation and submission writers (codebase/RAFT/evaluate.py).

- validate_* : EPE (and KITTI F1) over standard splits.
- create_sintel_submission / create_kitti_submission : write the flow
  files in each benchmark's upload format (.flo folders / 16-bit pngs),
  mirroring evaluate.py:21-60.

``flow_fn(img1 [1,H,W,3], img2) -> flow [1,H,W,2]`` is any jitted model
apply (RAFT, FlowFormer, or the Farnebäck op), padded/unpadded by the
caller or via the helper below.
"""

from __future__ import annotations

import pathlib
from typing import Callable, Iterable

import numpy as np

from nsof_tpu.data import flow_datasets as fd


def _pad8_np(img: np.ndarray):
    h, w = img.shape[1:3]
    ph = (-h) % 8
    pw = (-w) % 8
    pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2),
            (0, 0))
    return np.pad(img, pads, mode="edge"), pads


def run_padded(flow_fn: Callable, img1: np.ndarray, img2: np.ndarray):
    """Pad to /8, run, unpad (InputPadder semantics)."""
    p1, pads = _pad8_np(img1)
    p2, _ = _pad8_np(img2)
    flow = np.asarray(flow_fn(p1, p2))
    t, _, l, _ = pads[1][0], pads[1][1], pads[2][0], pads[2][1]
    h, w = img1.shape[1:3]
    return flow[:, t : t + h, l : l + w]


def validate_pairs(
    flow_fn: Callable,
    pairs: Iterable[fd.FlowPair],
    max_pairs: int | None = None,
) -> dict:
    """Mean EPE + KITTI-style F1 (err>3px and >5% of magnitude) over
    ground-truthed pairs."""
    import cv2

    epes, out_frac = [], []
    for i, pair in enumerate(pairs):
        if max_pairs is not None and i >= max_pairs:
            break
        if pair.flow_path is None:
            continue
        i1 = cv2.cvtColor(cv2.imread(pair.img1_path), cv2.COLOR_BGR2RGB)
        i2 = cv2.cvtColor(cv2.imread(pair.img2_path), cv2.COLOR_BGR2RGB)
        gt, valid = fd.read_flow_any(pair.flow_path)
        pred = run_padded(
            flow_fn, i1[None].astype(np.float32), i2[None].astype(np.float32)
        )[0]
        err = np.sqrt(((pred - gt) ** 2).sum(-1))
        mag = np.sqrt((gt**2).sum(-1))
        if valid is None:
            valid = np.ones(err.shape, bool)
        epes.append(err[valid].mean())
        out = (err > 3.0) & (err / np.maximum(mag, 1e-9) > 0.05)
        out_frac.append(out[valid].mean())
    return {
        "epe": float(np.mean(epes)) if epes else float("nan"),
        "f1": 100.0 * float(np.mean(out_frac)) if out_frac else float("nan"),
        "n": len(epes),
    }


def create_sintel_submission(
    flow_fn: Callable, root, out_dir, dstype: str = "clean"
) -> int:
    """Write frame_%04d.flo per scene (evaluate.py create_sintel_submission)."""
    import cv2

    out_dir = pathlib.Path(out_dir) / dstype
    n = 0
    pairs = fd.scan_sintel(root, split="test", dstype=dstype)
    for pair in pairs:
        scene = pathlib.Path(pair.img1_path).parent.name
        idx = int(pathlib.Path(pair.img1_path).stem.split("_")[-1])
        i1 = cv2.cvtColor(cv2.imread(pair.img1_path), cv2.COLOR_BGR2RGB)
        i2 = cv2.cvtColor(cv2.imread(pair.img2_path), cv2.COLOR_BGR2RGB)
        flow = run_padded(
            flow_fn, i1[None].astype(np.float32), i2[None].astype(np.float32)
        )[0]
        d = out_dir / scene
        d.mkdir(parents=True, exist_ok=True)
        fd.write_flo(d / f"frame_{idx:04d}.flo", flow)
        n += 1
    return n


def create_kitti_submission(flow_fn: Callable, root, out_dir) -> int:
    """Write KITTI 16-bit png flow files (evaluate.py create_kitti_submission)."""
    import cv2

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for pair in fd.scan_kitti(root, split="testing"):
        i1 = cv2.cvtColor(cv2.imread(pair.img1_path), cv2.COLOR_BGR2RGB)
        i2 = cv2.cvtColor(cv2.imread(pair.img2_path), cv2.COLOR_BGR2RGB)
        flow = run_padded(
            flow_fn, i1[None].astype(np.float32), i2[None].astype(np.float32)
        )[0]
        name = pathlib.Path(pair.img1_path).name
        fd.write_kitti_flow(out_dir / name, flow)
        n += 1
    return n
