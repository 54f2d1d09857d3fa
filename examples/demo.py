"""Walkthrough demo: merged-region motion segmentation on data/grasp.

Script equivalent of the reference's ``demo.ipynb`` (whose cells replicate
opticalFlow3D + task_results on the grasp scene): loads the device-state
matrix and RGB frames, runs the ROI-gated pipeline on a few frame pairs,
prints per-pair metrics, and writes mask/flow visualisations.

Run: python examples/demo.py [data_root] [out_dir]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main(data_root="/root/reference/data", out_dir="output/demo"):
    import cv2
    import jax.numpy as jnp

    from nsof_tpu.data import load_scene
    from nsof_tpu.pipelines.segmentation import (
        pixel_accuracy,
        seg_step,
        seg_step_full,
    )
    from nsof_tpu.utils.flow_viz import flow_to_image

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    print("Loading the grasp scene (state matrix + RGB + GT masks)…")
    scene = load_scene(data_root, "grasp", max_frames=12)
    cfg = scene.cfg
    print(f"  frames: {len(scene.names)}, device grid: "
          f"{scene.mem_gray.shape[1:]}, MEMSIZE={cfg.roi.memsize}")

    for i in range(min(scene.num_pairs, 4)):
        mem2, prev, nxt = scene.pair_inputs(i)
        roi = seg_step(mem2, prev, nxt, cfg)
        full = seg_step_full(prev, nxt, cfg)

        gt = scene.gt_masks[i + 1] if scene.gt_masks is not None else None
        pa_roi = float(pixel_accuracy(roi["mask"], gt)) if gt is not None else float("nan")
        pa_full = float(pixel_accuracy(full["mask"], gt)) if gt is not None else float("nan")
        x0, y0, x1, y1 = np.asarray(roi["box"])
        print(
            f"  pair {i}: ROI box=({x0},{y0})–({x1},{y1}) "
            f"({float(roi['region_pct']):.1f}% of frame)  "
            f"PA roi={pa_roi:.2f} full={pa_full:.2f}"
        )

        cv2.imwrite(str(out / f"mask_roi_{i}.png"), np.asarray(roi["mask"]))
        cv2.imwrite(str(out / f"mask_full_{i}.png"), np.asarray(full["mask"]))
        viz = np.asarray(
            flow_to_image(jnp.asarray(roi["flow"]), convert_to_bgr=True)
        )
        cv2.imwrite(str(out / f"flow_{i}.png"), viz)

    print(f"Visualisations written to {out}/")


if __name__ == "__main__":
    main(*sys.argv[1:])
