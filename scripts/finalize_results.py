"""Assemble RESULTS.md from results/scene_rows.json + train_smoke.json.

Run after scripts/run_all_scenes.py (and optionally train_smoke.py).
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent


def main(out_md="RESULTS.md"):
    rows = json.loads((REPO / "results/scene_rows.json").read_text())
    lines = [
        "# RESULTS — dual-path metrics on the bundled reference scenes",
        "",
        "ROI = neuromorphic-gated path; full = full-frame baseline — the",
        "reference's own comparison protocol (optical_flow_seg.py:492-545),",
        "reproduced per scene with per-stage timing.  Per-frame",
        "reference-schema CSVs + text logs live in results/<scene>/.",
        "autodriving/uav/uavnew2 run FLAG=1 (per-component flow, union-box",
        "head) per their Parameters.txt; grasp/tabletennis run FLAG=2.",
        "",
        "| scene | mode | pairs | seg PA ROI | seg PA full | mIoU ROI |"
        " mIoU full | SSIM ROI | SSIM full | wall s |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['scene']} | — | — | {r['error'][:40]} |"
                         " | | | | | |")
            continue
        lines.append(
            f"| {r['scene']} | {r['mode']} | {r['pairs']} |"
            f" {r['seg_pa_roi']:.2f} | {r['seg_pa_full']:.2f} |"
            f" {r['track_iou']:.3f} | {r['track_iou_full']:.3f} |"
            f" {r['pred_ssim']:.3f} | {r['pred_ssim_full']:.3f} |"
            f" {r.get('wall_s', float('nan')):.0f} |"
        )
    lines += [
        "",
        "## Reading the table",
        "",
        "- **autodriving** is the neuromorphic path's flagship: ROI seg PA"
        " 88.1 vs full-frame 51.2 — full-frame Farnebäck drowns in global"
        " motion that the device map gates out.  Both paths score ~0"
        " tracking mIoU here: the scene's GT masks cover large static"
        " structures whose max-bbox does not correspond to moving-object"
        " boxes; the reference's head (identical logic) behaves the same.",
        "- **uav** ROI seg PA trails its own full-frame baseline (91.7 vs"
        " 94.1).  Diagnosed as inherent to the reference algorithm, not"
        " this implementation: a cv2/numpy transliteration of the"
        " reference FLAG=1 pipeline scores PA 91.72 on the same pairs —"
        " the 4×4 device grid misses motion at GT boundaries, and several of the"
        " losing pairs have a 0 % active region (zero-mask early exit).",
        "- **tabletennis/grasp** ROI ≥ full on all three tasks; tracking"
        " mIoU: tabletennis ROI 0.29 vs full 0.16, grasp ROI 0.34 vs full"
        " 0.00 (full-frame flow over the mostly-static 1080×1920 scene"
        " yields magnitudes the contour/area filter rejects on every"
        " pair — gating is what makes boxes exist at all).",
        "- Prediction SSIM is within noise of the baseline everywhere"
        " (ROI warps only the moving region; the rest is the next frame).",
        "",
        "## Training smoke runs (scripts/train_smoke.py)",
        "",
    ]
    smoke_path = REPO / "results/train_smoke.json"
    if smoke_path.exists():
        smoke = json.loads(smoke_path.read_text())
        lines.append(
            "| model | steps | mesh | EPE @0 | EPE final | resume |"
        )
        lines.append("|---|---|---|---|---|---|")
        for s in smoke:
            resume = (
                f"bit-equal orbax restore @ step {s['resume_at']}"
                if s["model"] == "raft" else "—"
            )
            mesh = (
                f"dp={s['mesh']['data']}×tp={s['mesh']['model']}"
                if s["model"] == "raft"
                else f"dp={s['mesh']['data'] * s['mesh']['model']}"
            )
            lines.append(
                f"| {s['model']} | {s['steps']} | {mesh} |"
                f" {s['epe_initial']:.2f} | {s['epe_final']:.2f} |"
                f" {resume} |"
            )
        lines += [
            "",
            "Synthetic affine dataset (exact GT), virtual 8-device CPU"
            " mesh; loss/EPE trajectories in results/train_smoke.json."
            " RAFT-small (240 steps @96×128) reaches a lower"
            " from-scratch EPE than the 2-stage-Twins FlowFormer"
            " (80 steps @64×96, shallow decoder) — the measured cost of"
            " the reduced backbone + shorter schedule; both models train"
            " through the same sharded step/loss/optimizer"
            " infrastructure (FlowFormer data-parallel, RAFT dp×tp).",
        ]
    audit_path = REPO / "results/fast_audit.json"
    if audit_path.exists():
        audit = json.loads(audit_path.read_text())
        lines += [
            "",
            "## Fast-path accuracy audit (scripts/audit_fast_path.py)",
            "",
            "`seg_batch_fast` (the TPU throughput path; bounded per-level",
            "warp radius — contract in nsof_tpu/ops/farneback_fast.py) vs",
            "the exact OpenCV-parity path, on every bundled scene at each",
            "preset's shipped radius.  Agreement = fraction of seg-mask",
            "pixels equal to the exact path; EPE over pixels where either",
            "path produced flow; PA Δ = |pixel-accuracy-vs-gtmask delta|.",
            "Radii are auto-selected (smallest meeting agreement ≥ 0.995",
            "and PA Δ ≤ 0.1; when agreement plateaus across radii — the",
            "residual is not the warp clamp — the smallest radius on the",
            "plateau, e.g. uav) and pinned by tests/test_fast_audit.py.",
            "grasp audits at its shipped r=3 on B=4 sub-batches: its",
            "full-frame 1920×1080 window exceeds HBM at the fused path's",
            "B=128, and radii > 3 exceed HBM at any batch there.",
            "",
            "| scene | radius | agreement mean | agreement min | EPE p50 |"
            " EPE p95 | PA Δ | pairs |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for name, row in audit.items():
            sel = row.get("selected_radius")
            if sel is None:
                lines.append(f"| {name} | — (no radius met floors) |"
                             " | | | | | |")
                continue
            rr = row["radii"][str(sel)]
            pairs = str(row["pairs"]) + (
                " (subsampled)" if row.get("subsampled") else ""
            )
            pa_d = (f"{rr['pa_delta']:.3f}" if "pa_delta" in rr else "—")
            lines.append(
                f"| {name} | {sel} | {rr['mask_agreement_mean']:.4f} |"
                f" {rr['mask_agreement_min']:.4f} | {rr['epe_p50']:.3f} |"
                f" {rr['epe_p95']:.3f} | {pa_d} | {pairs} |"
            )
    lines += [
        "",
        "## Headline benchmark",
        "",
        "`bench.py` (ROI-gated Farnebäck segmentation, 640×480, batch 1536,"
        " one v5e): **3,610 fps** (round 1: 1,719; round 2: 2,793; target"
        " ≥3,000). See BENCH_r0*.json for the driver-recorded trajectory.",
        "",
        "Generated by scripts/finalize_results.py from"
        " results/scene_rows.json (scene wall-times include jit compiles;"
        " per-pair stage times in the CSVs are dispatch-floor-corrected —"
        " see nsof_tpu/pipelines/runner.py).",
    ]
    (REPO / out_md).write_text("\n".join(lines) + "\n")
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main(*sys.argv[1:])
