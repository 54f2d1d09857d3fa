import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
"""Event-driven device-simulation throughput: TPU scan vs the reference's
vectorized-numpy design.

The reference simulator (eventsim/event_mem_sim.py:164-328) is a Python
loop over time slices with vectorized numpy state updates per slice.
This bench runs the same workload through nsof_tpu's on-device lax.scan
(`simulate_events`) and through a faithful numpy per-slice loop (the
reference's structure: V1 boxcar :207-227, V2 split w/ refractory
:230-286), on an HD event-camera grid (1280x720 — the reference's
driving_data.hdf5 resolution) at the default 1000 fps state rate.

Prints one JSON row per (path, impl).  Usage:
    python scripts/bench_event_sim.py [--grid 1280x720] [--duration 2.0]
    [--numpy-slices 100] [--out results/event_sim_bench.json]
"""

import argparse
import dataclasses
import json
import time

import numpy as np


def numpy_update_state(w, v, p, dt):
    """The reference's update_state (event_mem_sim.py:40-57) in numpy."""
    off = v < p.v_off
    on = v > p.v_on
    drive_off = np.maximum(v / p.v_off - 1.0, 0.0)
    drive_on = np.maximum(v / p.v_on - 1.0, 0.0)
    win_off = np.power(1.0 - w * p.s_off, p.b_off)
    win_on = np.power(1.0 - w * p.s_on, p.b_on)
    d_off = p.k_off * np.power(drive_off, p.alpha_off) * win_off
    d_on = p.k_on * np.power(drive_on, p.alpha_on) * win_on
    dw = np.where(off, d_off, np.where(on, d_on, 0.0))
    return np.clip(w + dw * dt, 0.0, 1.0)


def numpy_v1(binned, cfg, n_slices):
    """Reference V1 boxcar loop (event_mem_sim.py:207-227)."""
    p = cfg.params
    w = np.full((binned.height, binned.width), p.w_init, np.float32)
    for i in range(n_slices):
        v = np.where(
            binned.counts[i] >= cfg.theta_events, cfg.active_v, cfg.silent_v
        ).astype(np.float32)
        w = numpy_update_state(w, v, p, cfg.dt)
    return w


def numpy_v2_split(binned, cfg, n_slices):
    """Reference V2 split loop with refractory (event_mem_sim.py:230-286)."""
    p = cfg.params
    h, w_ = binned.height, binned.width
    arrays = [np.full((h, w_), p.w_init, np.float32) for _ in range(2)]
    next_ok = [np.zeros((h, w_), np.int64) for _ in range(2)]
    masks = [binned.on_any, binned.off_any]
    for i in range(n_slices):
        for k in range(2):
            ok = masks[k][i] & (next_ok[k] <= binned.t_first[i])
            v = np.where(ok, cfg.silent_v + cfg.active_v, cfg.silent_v)
            arrays[k] = numpy_update_state(
                arrays[k], v.astype(np.float32), p, cfg.dt
            )
            next_ok[k][ok] = binned.t_last[i] + cfg.refractory_us
    return arrays[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="640x360",
                    help="WxH; the dense [T,H,W] boxcar tensors scale "
                         "linearly in H*W*T — 1280x720 at 2 s is ~7 GB")
    ap.add_argument("--duration", type=float, default=1.0)
    ap.add_argument("--slice-us", type=int, default=1000)
    ap.add_argument("--numpy-slices", type=int, default=100,
                    help="slices actually run on the numpy path (per-slice "
                         "cost is constant; wall extrapolates linearly)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    gw, gh = (int(v) for v in args.grid.split("x"))

    import jax

    from nsof_tpu.device.event_sim import (
        EventSimConfig,
        bin_events,
        simulate_events,
    )
    from nsof_tpu.device.synthetic import generate_synthetic_events

    # two input variants so the device tunnel can't serve cached results
    streams = []
    for flip in (False, True):
        x, y, pol, t = generate_synthetic_events(
            height=gh, width=gw, box_h=gh // 8, box_w=gh // 8,
            speed_pps=300, duration_s=args.duration,
        )
        if flip:
            pol = 1 - pol  # swap ON/OFF: same shapes, different values
        t0 = time.perf_counter()
        b = bin_events(x, y, pol, t, slice_us=args.slice_us,
                       height=gh, width=gw)
        bin_s = time.perf_counter() - t0
        streams.append(b)
    n_slices = min(s.counts.shape[0] for s in streams)

    def trim(b):
        return dataclasses.replace(
            b,
            counts=b.counts[:n_slices], on_any=b.on_any[:n_slices],
            off_any=b.off_any[:n_slices], any_ev=b.any_ev[:n_slices],
            t_first=b.t_first[:n_slices], t_last=b.t_last[:n_slices],
            valid=b.valid[:n_slices],
        )

    streams = [trim(b) for b in streams]
    n_events = int(streams[0].counts.sum())

    # device-resident copies for the scan path: ingest happens once in a
    # deployment; re-uploading ~GB of boxcar tensors per timed call would
    # measure the tunnel, not the simulator
    import jax.numpy as jnp

    dev_streams = [
        dataclasses.replace(
            b,
            counts=jnp.asarray(b.counts), on_any=jnp.asarray(b.on_any),
            off_any=jnp.asarray(b.off_any), any_ev=jnp.asarray(b.any_ev),
            t_first=jnp.asarray(b.t_first), t_last=jnp.asarray(b.t_last),
            valid=jnp.asarray(b.valid),
        )
        for b in streams
    ]
    cell_updates = n_slices * gh * gw  # one state update per cell per slice

    rows = []

    def emit(path, impl, wall_s, extrapolated=False, arrays=1):
        rows.append({
            "bench": "event_sim",
            "path": path,
            "impl": impl,
            "grid": f"{gw}x{gh}",
            "slices": n_slices,
            "events": n_events,
            "wall_s": round(wall_s, 4),
            "cell_updates_per_s": round(arrays * cell_updates / wall_s),
            "extrapolated": extrapolated,
        })
        print(json.dumps(rows[-1]))

    for version, polarity, n_arrays in (
        (1, "magnitude", 1), (2, "split", 2)
    ):
        cfg = EventSimConfig(version=version, polarity=polarity)

        # --- TPU lax.scan path ---
        # one jitted program for the whole simulation: outside jit every
        # surrounding op dispatches eagerly (~30 ms tunnel floor each)
        @jax.jit
        def sim_scalar(counts, on_any, off_any, any_ev, t_first, t_last,
                       valid, eps, _b=dev_streams[0], _cfg=cfg,
                       _n=n_arrays):
            b = dataclasses.replace(
                _b, counts=counts, on_any=on_any, off_any=off_any,
                any_ev=any_ev, t_first=t_first, t_last=t_last, valid=valid,
            )
            # per-call jitter on the initial state so the tunnel can't
            # serve a cached execution for repeated timed calls
            w0 = jnp.full((gh, gw), _cfg.params.w_init, jnp.float32) + eps
            state0 = {
                "w": (w0,) * _n,
                "next_ok": (jnp.zeros((gh, gw), jnp.int32),) * _n,
            }
            out = simulate_events(b, _cfg, initial_state=state0)
            return out["w_final"].sum() + out["resistances"][-1].sum()

        call_no = [0]

        def run(b):
            call_no[0] += 1
            return float(sim_scalar(b.counts, b.on_any, b.off_any,
                                    b.any_ev, b.t_first, b.t_last, b.valid,
                                    jnp.float32(call_no[0] * 1e-6)))

        run(dev_streams[0])  # compile + warm
        run(dev_streams[1])
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            run(dev_streams[i % 2])
            ts.append(time.perf_counter() - t0)
        emit(f"v{version}_{polarity}",
             f"jax_scan[{jax.default_backend()}]",
             float(np.median(ts)), arrays=n_arrays)

        # --- reference-style numpy loop (host CPU) ---
        npy = numpy_v1 if version == 1 else numpy_v2_split
        k = min(args.numpy_slices, n_slices)
        npy(streams[0], cfg, min(5, k))  # touch caches
        t0 = time.perf_counter()
        npy(streams[0], cfg, k)
        per_slice = (time.perf_counter() - t0) / k
        emit(f"v{version}_{polarity}", "numpy_loop[host]",
             per_slice * n_slices, extrapolated=k < n_slices,
             arrays=n_arrays)

    print(json.dumps({
        # preprocessing shared by both paths; dominated by materialising
        # the dense [T, H, W] boxcar tensors, not by per-event work
        "bench": "event_sim_binning",
        "impl": "native_cpp_or_numpy",
        "events": n_events,
        "dense_cells": 4 * cell_updates,  # counts + 3 bool masks
        "wall_s": round(bin_s, 4),
        "dense_cells_per_s": round(4 * cell_updates / bin_s)
        if bin_s > 0 else None,
    }))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
