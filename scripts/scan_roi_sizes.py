"""Scan a bundled scene's state matrices for the max merged-ROI size.

Informs the static ROI-window presets in nsof_tpu/config.py (the
idiomatic-TPU replacement for the reference's dynamic crops).

Usage: python scripts/scan_roi_sizes.py [data_root]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main(root="/root/reference/data"):
    import scipy.io

    from nsof_tpu.config import DATASETS
    from nsof_tpu.device.model import conductance_to_gray
    from nsof_tpu.ops.roi import roi_boxes

    for name, cfg in DATASETS.items():
        try:
            mat = scipy.io.loadmat(
                f"{root}/{name}/constructed_3D_matrix.mat"
            )["constructed3DMatrix"]
        except FileNotFoundError:
            print(f"{name}: no mat file")
            continue
        max_w = max_h = 0
        active = 0
        for t in range(mat.shape[2]):
            mem = np.asarray(conductance_to_gray(mat[:, :, t]))
            out = roi_boxes(mem, cfg.image_h, cfg.image_w, cfg.roi)
            if bool(out["any_active"]):
                active += 1
                x0, y0, x1, y1 = np.asarray(out["merged"])
                max_w = max(max_w, int(x1 - x0))
                max_h = max(max_h, int(y1 - y0))
        print(
            f"{name}: image {cfg.image_h}x{cfg.image_w}, "
            f"{active}/{mat.shape[2]} active frames, "
            f"max ROI h×w = {max_h}×{max_w}, "
            f"preset window = {cfg.win_shape}"
        )


if __name__ == "__main__":
    main(*sys.argv[1:])
