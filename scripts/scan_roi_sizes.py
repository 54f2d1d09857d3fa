"""Scan a bundled scene's state matrices for the max merged-ROI size.

Informs the static ROI-window presets in nsof_tpu/config.py (the
idiomatic-TPU replacement for the reference's dynamic crops).

Usage: python scripts/scan_roi_sizes.py [data_root] [--deep]

--deep scans at the deep-pipeline geometry instead (frames at 1/3, cell
size MEMSIZE/3 — raft_seg.py:62-72, :460-464), informing the static
window presets for the RAFT/FlowFormer benches: at deep scale the merged
grasp ROI peaks at 452×300 on a 640×360 frame (p50 area 10%), NOT frame
size — gating does pay on the deep path.
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")


def main(root="/root/reference/data", mode=""):
    import scipy.io

    from nsof_tpu.config import DATASETS
    from nsof_tpu.device.model import conductance_to_gray
    from nsof_tpu.ops.roi import roi_boxes

    deep = mode == "--deep"
    for name, cfg in DATASETS.items():
        if deep:
            cfg = dataclasses.replace(
                cfg,
                image_h=cfg.image_h // 3,
                image_w=cfg.image_w // 3,
                roi=dataclasses.replace(
                    cfg.roi, memsize=max(cfg.roi.memsize // 3, 1)
                ),
            )
        try:
            mat = scipy.io.loadmat(
                f"{root}/{name}/constructed_3D_matrix.mat"
            )["constructed3DMatrix"]
        except FileNotFoundError:
            print(f"{name}: no mat file")
            continue
        max_w = max_h = 0
        active = 0
        pcts = []
        for t in range(mat.shape[2]):
            mem = np.asarray(conductance_to_gray(mat[:, :, t]))
            out = roi_boxes(mem, cfg.image_h, cfg.image_w, cfg.roi)
            if bool(out["any_active"]):
                active += 1
                x0, y0, x1, y1 = np.asarray(out["merged"])
                max_w = max(max_w, int(x1 - x0))
                max_h = max(max_h, int(y1 - y0))
                pcts.append(
                    100.0 * (x1 - x0) * (y1 - y0)
                    / (cfg.image_h * cfg.image_w)
                )
        p50 = float(np.median(pcts)) if pcts else 0.0
        print(
            f"{name}{' (deep 1/3)' if deep else ''}: "
            f"image {cfg.image_h}x{cfg.image_w}, "
            f"{active}/{mat.shape[2]} active frames, "
            f"max ROI h×w = {max_h}×{max_w}, p50 area {p50:.1f}%, "
            f"preset window = {cfg.win_shape}"
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
