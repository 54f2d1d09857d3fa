"""Fast-path accuracy audit: seg_batch_fast vs the exact path, per scene.

The TPU throughput path (nsof_tpu.ops.farneback_fast) bounds per-level
displacement to ``warp_radius`` (clamped beyond — see the accuracy
contract in that module's docstring).  This audit measures, on every
bundled reference scene and for a sweep of radii:

- **mask agreement**: fraction of pixels where the fast path's seg mask
  equals the exact OpenCV-parity path's mask (the product-level metric);
- **flow EPE** between the two paths inside the ROI (masked to the
  active box), p50/p95/max over all pairs;
- **pixel accuracy vs gtmask** for both paths (task-level impact).

It then auto-selects the smallest radius meeting the agreement floor
(mean ≥ 0.995 and PA delta ≤ 0.1) per scene; the selected values are
recorded as ``PipelineConfig.warp_radius`` in nsof_tpu/config.py and
pinned by tests/test_fast_audit.py.

Usage: python scripts/audit_fast_path.py [scene,scene,...] [--pairs N]
Writes results/fast_audit.json and prints one JSON row per scene.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

RADII = (3, 5, 7)
AGREEMENT_FLOOR = 0.995
PA_DELTA_MAX = 0.1


def audit_scene(name: str, data_root="/root/reference/data", max_pairs=None):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nsof_tpu.data import load_scene
    from nsof_tpu.pipelines.segmentation import (
        pixel_accuracy,
        seg_batch_fast,
        seg_step,
    )

    scene = load_scene(data_root, name)
    n = scene.num_pairs
    if max_pairs is not None and n > max_pairs:
        # evenly-spaced subsample, documented in the output row
        idx = np.linspace(0, n - 1, max_pairs).round().astype(int)
    else:
        idx = np.arange(n)
    mem = jnp.asarray(scene.mem_gray[1:][idx])
    prev = jnp.asarray(scene.frames_gray[:-1][idx])
    nxt = jnp.asarray(scene.frames_gray[1:][idx])
    gts = None
    if scene.gt_masks is not None:
        gts = (np.asarray(scene.gt_masks[1:][idx]) > 0).astype(np.uint8) * 255

    cfg = scene.cfg
    t0 = time.time()

    # exact path (host-looped jitted per-pair program; see
    # pipelines/runner.py::_map_pairs for why not vmap)
    jstep = jax.jit(lambda m, p, x: seg_step(m, p, x, cfg))
    exact_masks, exact_flows = [], []
    for i in range(len(idx)):
        out = jax.block_until_ready(jstep(mem[i], prev[i], nxt[i]))
        exact_masks.append(np.asarray(out["mask"]))
        exact_flows.append(np.asarray(out["flow"]))
    exact_masks = np.stack(exact_masks)
    exact_flows = np.stack(exact_flows)
    exact_s = time.time() - t0

    # the throughput path runs the fused kernel only at batch %128 == 0;
    # pad by repeating the last pair so the audited kernel IS bench's.
    # Exception: a full-frame window at B=128 can exceed HBM (grasp:
    # 1920x1088 -> the r0/r1 coefficient planes alone are ~11 GB) — those
    # scenes audit the separable-kernel path unpadded, which shares the
    # bounded-warp-radius contract under audit.
    b = len(idx)
    wh, ww = cfg.win_shape
    fused_bytes = 128 * wh * ww * 60  # r0/r1 f32 + bf16 M + temporaries
    if fused_bytes > 10e9:
        # full-frame window (grasp 1920x1088): the fused path at B=128
        # exceeds HBM, and radii > 3 exceed HBM at ANY batch on the
        # separable path — audit the shipped radius on B=4 sub-batches
        kernel_mode = "pallas_sep"
        pad = 0
        sub_b = 4
        radii = (3,)
    else:
        kernel_mode = "auto"
        pad = ((b + 127) // 128) * 128 - b
        sub_b = None
        radii = RADII

    def padb(x):
        return jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)]) if pad else x

    row = {
        "scene": name,
        "pairs": int(b),
        "subsampled": bool(max_pairs is not None and n > max_pairs),
        "kernel_mode": kernel_mode,
        "exact_s": round(exact_s, 1),
        "radii": {},
    }
    pa_exact = None
    if gts is not None:
        pa_exact = float(
            np.mean([100.0 * (m == g).mean()
                     for m, g in zip(exact_masks, gts)])
        )
        row["pa_exact"] = round(pa_exact, 3)

    if sub_b is not None:
        row["sub_batch"] = sub_b
        row["radii_limited_by_hbm"] = True

    for r in radii:
        t0 = time.time()
        if sub_b is None:
            out = jax.block_until_ready(
                seg_batch_fast(padb(mem), padb(prev), padb(nxt), cfg, r,
                               kernel_mode, return_flow=True)
            )
            fast_masks = np.asarray(out["mask"])[:b]
            fast_flows = np.asarray(out["flow"])[:b]
        else:
            ms, fs = [], []
            for s in range(0, b, sub_b):
                e = min(s + sub_b, b)
                k = e - s
                args = [
                    (a[s:e] if sub_b - k == 0 else
                     jnp.concatenate([a[s:e],
                                      jnp.repeat(a[e-1:e], sub_b-k, 0)]))
                    for a in (mem, prev, nxt)
                ]
                out = jax.block_until_ready(
                    seg_batch_fast(*args, cfg, r, kernel_mode,
                                   return_flow=True)
                )
                ms.append(np.asarray(out["mask"])[:k])
                fs.append(np.asarray(out["flow"])[:k])
            fast_masks = np.concatenate(ms)
            fast_flows = np.concatenate(fs)
        fast_s = time.time() - t0

        agree = (fast_masks == exact_masks).mean(axis=(1, 2))
        # EPE where either path produced flow (inside the scattered ROI)
        act = (np.abs(exact_flows).sum(-1) > 0) | (
            np.abs(fast_flows).sum(-1) > 0
        )
        d = np.sqrt(((fast_flows - exact_flows) ** 2).sum(-1))
        epe = d[act] if act.any() else np.zeros(1)
        rrow = {
            "mask_agreement_mean": float(agree.mean()),
            "mask_agreement_min": float(agree.min()),
            "epe_p50": float(np.percentile(epe, 50)),
            "epe_p95": float(np.percentile(epe, 95)),
            "epe_max": float(epe.max()),
            "fast_s": round(fast_s, 1),
        }
        if gts is not None:
            pa_fast = float(
                np.mean([100.0 * (m == g).mean()
                         for m, g in zip(fast_masks, gts)])
            )
            rrow["pa_fast"] = round(pa_fast, 3)
            rrow["pa_delta"] = round(abs(pa_fast - pa_exact), 4)
        row["radii"][str(r)] = rrow

    row.update(select_radius(row["radii"], gts is not None))
    return row


def select_radius(radii: dict, has_gt: bool) -> dict:
    """Radius selection policy (pinned by tests/test_fast_audit.py).

    Primary: smallest radius meeting the absolute floors (agreement mean
    >= 0.995, PA delta <= 0.1).  Fallback: when agreement has plateaued —
    increasing the radius buys < 2e-4 agreement, i.e. the residual
    disagreement is not the warp-radius clamp — select the smallest
    radius within 2e-4 of the best, still requiring the PA floor.  The
    selection kind is recorded so the evidence table can distinguish.
    """
    present = sorted(int(k) for k in radii)
    best = max(rr["mask_agreement_mean"] for rr in radii.values())
    sel, kind = None, None
    for r in present:
        rr = radii[str(r)]
        if has_gt and rr["pa_delta"] > PA_DELTA_MAX:
            continue
        if rr["mask_agreement_mean"] >= AGREEMENT_FLOOR:
            sel, kind = r, "floor"
            break
    if sel is None:
        for r in present:
            rr = radii[str(r)]
            if has_gt and rr["pa_delta"] > PA_DELTA_MAX:
                continue
            if rr["mask_agreement_mean"] >= best - 2e-4:
                sel, kind = r, "plateau"
                break
    return {"selected_radius": sel, "selection": kind}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    max_pairs = None
    if "--pairs" in sys.argv:
        max_pairs = int(sys.argv[sys.argv.index("--pairs") + 1])
    names = args[0].split(",") if args else [
        "tabletennis", "uav", "uavnew2", "autodriving", "grasp"
    ]
    out_path = pathlib.Path("results/fast_audit.json")
    rows = {}
    if out_path.exists():
        rows = json.loads(out_path.read_text())
    for name in names:
        row = audit_scene(name, max_pairs=max_pairs)
        rows[name] = row
        print("ROW " + json.dumps(row), flush=True)
        out_path.parent.mkdir(exist_ok=True)
        out_path.write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
