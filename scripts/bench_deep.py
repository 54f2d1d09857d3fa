"""Deep-backend (RAFT / FlowFormer) on-chip benchmark with MFU.

The reference's deep pipelines log per-frame GPU-honest dual-path timings
(codebase/RAFT/raft_seg.py:91-98 syncs CUDA around every windowed
inference; FlowFormer-Official/ff_seg.py:95-107 likewise) and the README
claims a "400% boost" for the ROI-gated path (README.md:13).  This script
produces the TPU counterpart with the same honesty rules as bench.py:

* reference protocol — frames at 1/3 resolution (raft_seg.py:62-72),
  MEMSIZE/3 gating (:460-464), RAFT iters=20, FlowFormer things_eval;
* every timed dispatch fetches a scalar to the host and carries unique
  inputs (a per-call salt pixel — the device tunnel caches identical
  executions);
* per-frame latency is SYNCHRONOUS (one dispatch at a time, like the
  reference's per-frame torch.cuda.synchronize loop); batched throughput
  is reported separately;
* MFU = XLA-cost-analysis FLOPs of the compiled program / measured time /
  v5e bf16 peak (197 TFLOP/s).  Models run in bfloat16 (the production
  compute dtype; parity suites pin f32 separately).

Two workloads:
  A. localized motion at 480×640 (1/3 of a 1440×1920 capture), ROI window
     256×384 vs full frame — the ROI-boost demonstration;
  B. the real grasp scene at its true 1/3 shape 640×360 (window == frame
     for this preset: scripts/scan_roi_sizes.py shows the merged grasp
     ROI reaches frame size, so ROI≈full there — stated, not hidden).

Writes results/deep_bench.json and prints one summary JSON line.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

# Persist XLA compiles (tunnel compiles dominate wall time; reruns and the
# AOT cost-analysis lower().compile() calls hit the cache instead).
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
V5E_BF16_PEAK = 197e12  # TPU v5e (v5 lite) bf16 MXU peak, FLOP/s


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0)) if ca else 0.0


def time_sync(call, n_iters: int, warmup: int = 2) -> dict:
    """Median/p90 of synchronous per-dispatch wall time; every call must
    fetch its result (the caller's closure does float(...))."""
    for i in range(warmup):
        call(i)
    ts = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        call(warmup + i)
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    return {
        "p50_s": float(np.median(ts)),
        "p90_s": float(np.quantile(ts, 0.9)),
        "n": n_iters,
    }


def make_workload(h: int, w: int, ms_full: int, n_var: int, rng):
    """Synthetic localized-motion pairs + a 2×2-active-cell device map
    (the bench.py workload at deep-pipeline scale)."""
    import jax.numpy as jnp

    base = rng.random((h + 64, w + 64, 3)).astype(np.float32) * 255
    prevs, nxts = [], []
    for v in range(n_var):
        prevs.append(jnp.asarray(
            base[16 + v : 16 + v + h, 16 : 16 + w].astype(np.uint8)))
        nxts.append(jnp.asarray(
            base[18 + v : 18 + v + h, 15 : 15 + w].astype(np.uint8)))
    ms_deep = max(ms_full // 3, 1)
    gh, gw = h // ms_deep, w // ms_deep
    mem = np.zeros((gh, gw), np.uint8)
    mem[3:6, 4:7] = 255  # ~3×3 cells ≈ 78×78 px active region
    return jnp.asarray(mem), prevs, nxts


def bench_backend(name, backend, cfg, mem, prevs, nxts, iters=10):
    """ROI vs full per-frame latency + FLOPs/MFU for one backend."""
    import jax
    import jax.numpy as jnp

    from nsof_tpu.pipelines.deep_flow import (
        deep_full_flow_step,
        deep_roi_flow_step,
    )

    n_var = len(prevs)

    def salted(p, salt):
        return p.at[0, 0, :].set(salt)

    @jax.jit
    def roi_step(m, p, n, salt):
        out = deep_roi_flow_step(m, salted(p, salt), n, cfg, backend)
        return out["mask"].astype(jnp.int32).sum() + out["box"].sum()

    @jax.jit
    def full_step(p, n, salt):
        out = deep_full_flow_step(salted(p, salt), n, cfg, backend)
        return out["mask"].astype(jnp.int32).sum()

    salt_ctr = iter(range(1, 100_000))

    def roi_call(i):
        float(roi_step(mem, prevs[i % n_var], nxts[(i + 1) % n_var],
                       jnp.uint8(next(salt_ctr) % 251)))

    def full_call(i):
        float(full_step(prevs[i % n_var], nxts[(i + 1) % n_var],
                        jnp.uint8(next(salt_ctr) % 251)))

    t0 = time.perf_counter()
    roi_c = roi_step.lower(
        mem, prevs[0], nxts[0], jnp.uint8(0)).compile()
    full_c = full_step.lower(
        prevs[0], nxts[0], jnp.uint8(0)).compile()
    compile_s = time.perf_counter() - t0

    roi_t = time_sync(roi_call, iters)
    full_t = time_sync(full_call, iters)
    roi_fl = _flops_of(roi_c)
    full_fl = _flops_of(full_c)
    row = {
        "backend": name,
        "frame_hw": [cfg.image_h, cfg.image_w],
        "window_hw": [cfg.window_h or cfg.image_h,
                      cfg.window_w or cfg.image_w],
        "roi_ms_per_frame_p50": roi_t["p50_s"] * 1e3,
        "full_ms_per_frame_p50": full_t["p50_s"] * 1e3,
        "roi_fps_sync": 1.0 / roi_t["p50_s"],
        "full_fps_sync": 1.0 / full_t["p50_s"],
        "roi_speedup_vs_full": full_t["p50_s"] / roi_t["p50_s"],
        "roi_gflops": roi_fl / 1e9,
        "full_gflops": full_fl / 1e9,
        "roi_mfu": roi_fl / roi_t["p50_s"] / V5E_BF16_PEAK,
        "full_mfu": full_fl / full_t["p50_s"] / V5E_BF16_PEAK,
        "compile_s": compile_s,
        "timing": "synchronous per-frame (scalar fetch per dispatch, "
                  "unique salted inputs)",
    }
    print(f"# {name}: roi {row['roi_ms_per_frame_p50']:.1f} ms "
          f"({row['roi_mfu']*100:.1f}% MFU) vs full "
          f"{row['full_ms_per_frame_p50']:.1f} ms "
          f"({row['full_mfu']*100:.1f}% MFU) → "
          f"{row['roi_speedup_vs_full']:.2f}x", flush=True)
    return row


def bench_batched_roi(name, backend, cfg, mem, prevs, nxts, batch=8,
                      rounds=6):
    """Batched ROI-gated throughput: vmapped step, pipelined dispatches
    (the serving pattern), wall time spans enqueue→last fetch."""
    import jax
    import jax.numpy as jnp

    from nsof_tpu.pipelines.deep_flow import deep_roi_flow_step

    n_var = len(prevs)

    def one(m, p, n):
        return deep_roi_flow_step(m, p, n, cfg, backend)["mask"]

    @jax.jit
    def step(m, p, n, salt):
        p = p.at[:, 0, 0, :].set(salt[:, None])
        masks = jax.vmap(one, in_axes=(None, 0, 0))(m, p, n)
        return masks.astype(jnp.int32).sum()

    pb = [jnp.stack([prevs[(i + j) % n_var] for j in range(batch)])
          for i in range(n_var)]
    nb = [jnp.stack([nxts[(i + j + 1) % n_var] for j in range(batch)])
          for i in range(n_var)]
    salt_ctr = iter(range(1, 100_000))

    def salts():
        return jnp.asarray(
            [next(salt_ctr) % 251 for _ in range(batch)], jnp.uint8)

    float(step(mem, pb[0], nb[0], salts()))  # compile
    float(step(mem, pb[1], nb[1], salts()))
    t0 = time.perf_counter()
    outs = [step(mem, pb[i % n_var], nb[i % n_var], salts())
            for i in range(rounds)]
    for o in outs:
        float(o)
    dt = time.perf_counter() - t0
    fps = rounds * batch / dt
    print(f"# {name}: batched roi B={batch} → {fps:.1f} fps", flush=True)
    return {"backend": name, "batch": batch,
            "roi_fps_batched_pipelined": fps}


def bench_grasp_scene(backend_name, backend, iters=8):
    """Workload B: the real grasp scene at 1/3 shape (640×360), reference
    pair semantics, ROI path (456×304 static window — covers the measured
    max merged deep-scale ROI of 452×300 across all 99 slices) AND the
    full-frame baseline.  The round-4 'window==frame' saturation was the
    bench's own window choice, not scene geometry (RESULTS.md)."""
    import jax
    import jax.numpy as jnp

    from nsof_tpu.config import DATASETS
    from nsof_tpu.data import load_scene
    from nsof_tpu.pipelines.deep_flow import (
        deep_full_flow_step,
        deep_roi_flow_step,
        resize_third,
    )

    scene = load_scene("/root/reference/data", "grasp", max_frames=14)
    cfg = DATASETS["grasp"]
    h3, w3 = cfg.image_h // 3, cfg.image_w // 3
    # Round-4 ran window==frame here and reported zero gating benefit;
    # that was the bench's own choice, not scene geometry: at deep scale
    # (MEMSIZE/3 on 1/3 frames, raft_seg.py:460-464) the merged grasp ROI
    # measured over all 99 state slices peaks at 452×300 px (p50 area 10%
    # of frame) — scripts/scan_roi_sizes.py --deep.  A static 456×304
    # window covers every pair and keeps the /8 alignment.
    cfg = dataclasses.replace(cfg, image_h=h3, image_w=w3,
                              window_h=456, window_w=304)
    frames = np.asarray(
        resize_third(jnp.asarray(scene.frames_bgr))).astype(np.uint8)

    @jax.jit
    def step(m, p, n):
        out = deep_roi_flow_step(m, p, n, cfg, backend)
        return out["mask"].astype(jnp.int32).sum() + out["box"].sum()

    @jax.jit
    def full_step(p, n):
        out = deep_full_flow_step(p, n, cfg, backend)
        return out["mask"].astype(jnp.int32).sum()

    mem0, _, _ = scene.pair_inputs(0)
    float(step(jnp.asarray(mem0), jnp.asarray(frames[0]),
               jnp.asarray(frames[1])))  # compile
    float(full_step(jnp.asarray(frames[0]), jnp.asarray(frames[1])))
    ts, ts_full = [], []
    n_pairs = min(iters, scene.num_pairs)
    for i in range(n_pairs):
        mem2, _, _ = scene.pair_inputs(i)
        a = jnp.asarray(frames[i])
        b = jnp.asarray(frames[i + 1])
        m = jnp.asarray(mem2)
        t0 = time.perf_counter()
        float(step(m, a, b))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(full_step(a, b))
        ts_full.append(time.perf_counter() - t0)
    p50 = float(np.median(ts))
    p50f = float(np.median(ts_full))
    print(f"# {backend_name}: grasp scene 1/3 ({h3}x{w3}) roi "
          f"{p50*1e3:.1f} ms/frame ({1/p50:.1f} fps) vs full "
          f"{p50f*1e3:.1f} ms/frame ({n_pairs} real pairs)", flush=True)
    return {
        "backend": backend_name, "scene": "grasp",
        "frame_hw": [h3, w3], "pairs": n_pairs,
        "roi_ms_per_frame_p50": p50 * 1e3,
        "full_ms_per_frame_p50": p50f * 1e3,
        "roi_fps_sync": 1.0 / p50,
        "full_fps_sync": 1.0 / p50f,
        "window_hw": [cfg.window_h, cfg.window_w],
        "roi_speedup_vs_full": p50f / p50,
        "note": "456x304 static window covers the scene's max merged "
                "deep-scale ROI (452x300, scripts/scan_roi_sizes.py "
                "--deep); round-4's window==frame was a bench artifact",
    }


def bench_ff_tiled(backend, rounds=4):
    """FlowFormer tiled inference at its TRAIN_SIZE tile (432×960,
    visualize_flow.py:27-100 semantics) on a 480×1280 frame (2 tiles,
    gaussian-blended) — the FF throughput story for arbitrary
    resolutions."""
    import jax
    import jax.numpy as jnp

    from nsof_tpu.models.flowformer.model import tiled_flow

    rng = np.random.default_rng(3)
    H, W = 480, 1280
    base = rng.random((H + 8, W + 8, 3)).astype(np.float32) * 255

    @jax.jit
    def apply_tile(a, b):
        return backend.apply(a, b)

    def one(i):
        i1 = base[i % 4 : i % 4 + H, : W][None].astype(np.uint8)
        i2 = base[i % 4 + 1 : i % 4 + 1 + H, 1 : 1 + W][None].astype(
            np.uint8)
        return tiled_flow(
            lambda a, b: apply_tile(jnp.asarray(a), jnp.asarray(b)),
            i1, i2, patch_size=(432, 960), min_overlap=20)

    t0 = time.perf_counter()
    one(0)  # compile
    compile_s = time.perf_counter() - t0
    ts = []
    for i in range(rounds):
        t0 = time.perf_counter()
        fl = one(i + 1)
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts))
    n_tiles = 2
    print(f"# flowformer tiled 480x1280 (2x 432x960 tiles): "
          f"{p50*1e3:.0f} ms/frame ({1/p50:.2f} fps)", flush=True)
    return {"backend": "flowformer-things_eval", "mode": "tiled",
            "frame_hw": [H, W], "tile_hw": [432, 960],
            "n_tiles": n_tiles,
            "ms_per_frame_p50": p50 * 1e3, "fps": 1.0 / p50,
            "compile_s": compile_s,
            "flow_shape": list(np.asarray(fl).shape)}


def main():
    import jax
    import jax.numpy as jnp

    from nsof_tpu.config import DATASETS
    from nsof_tpu.models.raft import RAFT, RaftConfig
    from nsof_tpu.pipelines.deep_flow import DeepBackend

    rng = np.random.default_rng(0)
    rows = {"device": str(jax.devices()[0]),
            "peak_flops_bf16": V5E_BF16_PEAK,
            "workload_a": [], "workload_a_batched": [],
            "workload_b_grasp": [], "workload_c_ff_tiled": []}

    # -- workload A: 480×640, ROI window 256×384, memsize 80 → 26 deep --
    H, W = 480, 640
    cfg = dataclasses.replace(
        DATASETS["grasp"], name="deepbench", image_h=H, image_w=W,
        window_h=256, window_w=384,
    )
    mem, prevs, nxts = make_workload(H, W, cfg.roi.memsize, 6, rng)

    def raft_backend(small, corr_mode="allpairs"):
        mcfg = RaftConfig(small=small, iters=20,
                          compute_dtype=jnp.bfloat16, corr_mode=corr_mode)
        model = RAFT(mcfg)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        params = model.init(jax.random.PRNGKey(0), dummy, dummy, iters=1)[
            "params"]
        return DeepBackend.from_raft(model, params, iters=20)

    def ff_backend():
        from nsof_tpu.models.flowformer import FlowFormer
        from nsof_tpu.models.flowformer.config import get_experiment

        fcfg = dataclasses.replace(
            get_experiment("things_eval").model,
            compute_dtype=jnp.bfloat16)
        model = FlowFormer(fcfg)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
        return DeepBackend.from_flowformer(model, params)

    backends = [
        ("raft-small", raft_backend(True)),
        ("raft-basic", raft_backend(False)),
        ("raft-small-altcorr", raft_backend(True, "alternate")),
        ("flowformer-things_eval", ff_backend()),
    ]
    for name, be in backends:
        rows["workload_a"].append(
            bench_backend(name, be, cfg, mem, prevs, nxts))
    batched = [("raft-small", backends[0][1], 8),
               ("raft-basic", backends[1][1], 8),
               ("flowformer-things_eval", backends[3][1], 4)]
    for name, be, bsz in batched:
        rows["workload_a_batched"].append(
            bench_batched_roi(name, be, cfg, mem, prevs, nxts, batch=bsz))

    # -- workload B: real grasp scene ---------------------------------
    for name, be in backends[:2]:
        rows["workload_b_grasp"].append(bench_grasp_scene(name, be))

    # -- workload C: FF tiled inference at TRAIN_SIZE ------------------
    rows["workload_c_ff_tiled"] = [bench_ff_tiled(backends[3][1])]

    out = REPO / "results" / "deep_bench.json"
    out.write_text(json.dumps(rows, indent=1))
    a = rows["workload_a"]
    print(json.dumps({
        "metric": "deep_roi_speedup_raft_small",
        "value": round(a[0]["roi_speedup_vs_full"], 2),
        "unit": "x vs full-frame",
        "roi_fps": round(a[0]["roi_fps_sync"], 1),
        "mfu_full_raft_basic": round(a[1]["full_mfu"], 4),
        "written": str(out),
    }))


if __name__ == "__main__":
    main()
