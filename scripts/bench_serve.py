"""Serving-engine load test: latency vs offered load on the chip.

The reference serves nothing (offline scripts only; its honest-timing
analogue is ff_seg.py:95-107's per-frame CUDA syncs).  This drives
``serve.engine.BatchingEngine`` with open-loop concurrent synthetic
clients at a sweep of offered loads and reports, per load point:

* achieved throughput (completed requests / wall time)
* request latency p50 / p99 (submit → Future.result, the number a
  caller actually experiences — NOT the amortized per-frame throughput
  figure bench.py reports)
* engine batching stats (mean batch size, dispatches)

Every submitted frame carries a unique salt pixel (the device tunnel
caches identical executions).  The max_wait_ms knob is swept to expose
the latency/throughput trade-off.

Because every request ships real frames host→device, the achievable
rate over the benchmark's network tunnel is TRANSFER-bound (~20 MB/s
link vs GB/s PCIe on a real host); ``measure_transfer_bound`` records
that raw link bound alongside so the engine's own overhead is separable
from the link.

Writes results/serve_bench.json and prints one summary JSON line.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import sys
import threading
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

# Persist XLA compiles (tunnel compiles dominate wall time; reruns and the
# AOT cost-analysis lower().compile() calls hit the cache instead).
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_engine(max_wait_ms: float):
    from nsof_tpu.config import DATASETS
    from nsof_tpu.serve.engine import BatchingEngine

    H, W, MEMSIZE = 480, 640, 80
    cfg = dataclasses.replace(
        DATASETS["grasp"], name="serve640", image_h=H, image_w=W,
        window_h=256, window_w=384,
        roi=dataclasses.replace(DATASETS["grasp"].roi, memsize=MEMSIZE),
        warp_radius=3,
    )
    eng = BatchingEngine(
        cfg, max_batch=128, max_wait_ms=max_wait_ms,
        # Fine-grained ladder: every padded lane ships real bytes over
        # the link (the engine stacks host-side), so coarse buckets
        # multiply the transfer per useful request — at mean_batch ~2
        # a (8,32,128) ladder wastes 4-6× of a 40 MB/s link.
        buckets=(2, 4, 8, 16, 32, 64, 128),
    )
    return eng, cfg


def run_load_point(eng, cfg, rate_rps: float, duration_s: float,
                   salt_ctr) -> dict:
    """Open-loop load: submit at ``rate_rps`` for ``duration_s``; latency
    = submit→result per request."""
    H, W = cfg.image_h, cfg.image_w
    ms = cfg.roi.memsize
    rng = np.random.default_rng(0)
    base = (rng.random((H + 8, W + 8)) * 255).astype(np.uint8)
    prev0 = base[2 : 2 + H, 2 : 2 + W].copy()
    next0 = base[4 : 4 + H, 1 : 1 + W].copy()
    mem = np.zeros((H // ms, W // ms), np.uint8)
    mem[2:4, 3:5] = 255

    lat: list[float] = []
    lat_lock = threading.Lock()
    pending = []

    def submit_one():
        s = next(salt_ctr)
        prev = prev0.copy()
        prev[0, 0] = s % 251
        prev[0, 1] = (s // 251) % 251
        t0 = time.perf_counter()
        fut = eng.submit(mem, prev, next0)
        fut.add_done_callback(
            lambda f, t0=t0: (
                f.exception() is None
                and (lat_lock.__enter__(),
                     lat.append(time.perf_counter() - t0),
                     lat_lock.__exit__(None, None, None))
            )
        )
        pending.append(fut)

    # pace in 5 ms ticks (python sleep can't pace 0.25 ms intervals)
    tick = 0.005
    per_tick = rate_rps * tick
    t_start = time.perf_counter()
    credit = 0.0
    while time.perf_counter() - t_start < duration_s:
        credit += per_tick
        while credit >= 1.0:
            submit_one()
            credit -= 1.0
        time.sleep(tick)
    for f in pending:
        try:
            f.result(timeout=120)
        except Exception:
            pass
    wall = time.perf_counter() - t_start
    done = len(lat)
    lat_a = np.asarray(lat)
    return {
        "offered_rps": rate_rps,
        "achieved_rps": done / wall,
        "requests": done,
        "p50_ms": float(np.median(lat_a) * 1e3) if done else None,
        "p99_ms": float(np.quantile(lat_a, 0.99) * 1e3) if done else None,
        "max_ms": float(lat_a.max() * 1e3) if done else None,
    }


def measure_transfer_bound(cfg, b: int = 32) -> dict:
    """Raw tunnel round-trip for one engine dispatch payload: host→device
    of (mems, prevs, nxts) + a trivial reduction + host fetch of a
    [b, H, W] mask-shaped output.  The achievable request rate of ANY
    engine over this link is bounded by b / t — this row attributes the
    serve numbers to the link, not the engine (on a real host the same
    payload rides PCIe at GB/s)."""
    import jax
    import jax.numpy as jnp

    H, W = cfg.image_h, cfg.image_w
    ms = cfg.roi.memsize
    rng = np.random.default_rng(1)

    @jax.jit
    def trivial(m, p, n):
        return (p ^ n) | m[:, :1, :1]  # [b, H, W] u8 out, no real compute

    mems = np.zeros((b, H // ms, W // ms), np.uint8)
    p0 = (rng.random((b, H, W)) * 255).astype(np.uint8)
    n0 = (rng.random((b, H, W)) * 255).astype(np.uint8)
    np.asarray(trivial(mems, p0, n0))  # compile
    ts = []
    for i in range(5):
        p0[:, 0, 0] = i + 1  # unique payload per round (tunnel caches)
        t0 = time.perf_counter()
        np.asarray(trivial(mems, p0, n0))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    up_mb = (mems.nbytes + p0.nbytes + n0.nbytes) / 2**20
    down_mb = p0.nbytes / 2**20
    return {
        "batch": b,
        "roundtrip_s": t,
        "payload_up_mb": up_mb,
        "payload_down_mb": down_mb,
        "link_mb_per_s": (up_mb + down_mb) / t,
        "rps_bound": b / t,
    }


def main():
    import jax

    rows = {"device": str(jax.devices()[0]), "sweeps": []}
    salt_ctr = iter(range(1, 10_000_000))
    eng0, cfg0 = build_engine(2.0)
    eng0.shutdown(wait=False)
    rows["transfer_bound"] = measure_transfer_bound(cfg0)
    print(f"# transfer bound: {rows['transfer_bound']['rps_bound']:.0f}"
          f" rps at B={rows['transfer_bound']['batch']}"
          f" ({rows['transfer_bound']['link_mb_per_s']:.0f} MB/s link)",
          flush=True)
    for max_wait_ms in (2.0, 8.0):
        eng, cfg = build_engine(max_wait_ms)
        t0 = time.perf_counter()
        eng.warmup()
        warm_s = time.perf_counter() - t0
        points = []
        for rate in (5, 10, 15, 20, 30, 60):
            eng.stats.__init__()  # fresh stats per point
            pt = run_load_point(eng, cfg, rate, 8.0, salt_ctr)
            pt["engine"] = eng.stats.as_dict()
            points.append(pt)
            print(f"# wait={max_wait_ms}ms rate={rate}: "
                  f"achieved {pt['achieved_rps']:.0f} rps, "
                  f"p50 {pt['p50_ms']:.1f} ms, p99 {pt['p99_ms']:.1f} ms, "
                  f"mean_batch {pt['engine']['mean_batch']:.1f}",
                  flush=True)
        eng.shutdown()
        rows["sweeps"].append({
            "max_wait_ms": max_wait_ms,
            "warmup_s": warm_s,
            "points": points,
        })

    out = REPO / "results" / "serve_bench.json"
    out.write_text(json.dumps(rows, indent=1))
    # headline: peak achieved throughput vs the raw link bound (the
    # engine's own overhead is the gap; per-request p50 at light load is
    # dominated by the ~0.9 MB/request round trip over this tunnel)
    best = max(
        pt["achieved_rps"] for sw in rows["sweeps"] for pt in sw["points"]
    )
    print(json.dumps({
        "metric": "serve_peak_rps",
        "value": round(best, 1),
        "unit": "requests/s",
        "link_bound_rps": round(rows["transfer_bound"]["rps_bound"], 1),
        "fraction_of_link_bound": round(
            best / rows["transfer_bound"]["rps_bound"], 3
        ),
        "written": str(out),
    }))


if __name__ == "__main__":
    main()
