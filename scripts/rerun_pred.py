"""Re-run ONLY the prediction pipelines and patch scene_rows.json.

Used after the ssim precision fix (f32-pinned moment filters): the
seg/tracking rows are unaffected, so this refreshes pred_ssim* and the
pred CSVs without repaying the full sweep.

Usage: python scripts/rerun_pred.py [scene,scene,...]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np  # noqa: F401

    from nsof_tpu.data import load_scene
    from nsof_tpu.pipelines.runner import run_prediction

    names = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "tabletennis", "uav", "uavnew2", "autodriving", "grasp"
    ]
    rows_path = REPO / "results/scene_rows.json"
    rows = {r["scene"]: r for r in json.loads(rows_path.read_text())}
    for name in names:
        t0 = time.time()
        scene = load_scene("/root/reference/data", name)
        out_dir = REPO / "results" / name
        pred = run_prediction(
            scene, csv_path=out_dir / "pred.csv",
            txt_path=out_dir / "pred.txt", collect=False,
        )
        r = rows[name]
        r["pred_ssim"] = pred.metrics.get("mean_ssim", float("nan"))
        r["pred_ssim_full"] = pred.metrics.get(
            "mean_ssim_full", float("nan")
        )
        print(
            f"{name}: ssim {r['pred_ssim']:.4f} / {r['pred_ssim_full']:.4f}"
            f"  ({time.time() - t0:.0f}s)",
            flush=True,
        )
        rows_path.write_text(json.dumps(list(rows.values()), indent=1))


if __name__ == "__main__":
    main()
