"""Streaming-pipeline benchmark: the one-program deployment shape vs
offline replay, on the chip.

``pipelines/stream.py`` composes the reference's two offline phases —
MATLAB device integration (simulation/*.m) then a host loop over frame
pairs (optical_flow_seg.py:390-622) — into ONE compiled program (device
scan + ROI-gated batched flow).  This measures that claim:

* ``stream_masks``       — T frames in, one dispatch, masks out
* ``stream_masks_chunked`` — bounded-memory chunks (the unbounded-
  recording serving form), state carried chunk→chunk
* offline replay         — per-pair ``seg_step`` dispatches, the
  reference's loop structure (one host round-trip per frame pair)

All paths run the same workload (localized motion, 480×640, window
256×384); every timed call feeds unique frames (fresh shifted bases per
round — the device tunnel caches identical executions) and fetches a
scalar.  Writes results/stream_bench.json and prints one JSON line.
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


def make_stream(h, w, t, rng, salt: int):
    """[T, H, W] uint8 stream with a bright moving block (drives the
    device state) over a static textured background."""
    base = (rng.random((h, w)) * 96).astype(np.uint8)
    frames = np.broadcast_to(base, (t, h, w)).copy()
    for i in range(t):
        y = 120 + 2 * i
        x = (260 + 3 * i + salt) % (w - 120)
        frames[i, y % (h - 120) : y % (h - 120) + 96, x : x + 96] = 230
    return frames


def main():
    import jax
    import jax.numpy as jnp

    from nsof_tpu.config import DATASETS
    from nsof_tpu.device.frame_sim import FrameSimConfig
    from nsof_tpu.pipelines.segmentation import seg_step
    from nsof_tpu.pipelines.stream import stream_masks, stream_masks_chunked

    H, W, MEMSIZE = 480, 640, 80
    cfg = dataclasses.replace(
        DATASETS["grasp"], name="stream640", image_h=H, image_w=W,
        window_h=256, window_w=384,
        roi=dataclasses.replace(DATASETS["grasp"].roi, memsize=MEMSIZE),
        warp_radius=3,
    )
    sim = FrameSimConfig(m=MEMSIZE, n=MEMSIZE)
    rng = np.random.default_rng(0)
    T = 129  # 128 pairs per dispatch

    rows = {"device": str(jax.devices()[0]), "frames_per_call": T,
            "frame_hw": [H, W]}

    # -- one-program streaming ----------------------------------------
    @jax.jit
    def stream_fn(frames):
        out = stream_masks(frames, cfg, sim)
        return out["masks"].astype(jnp.int32).sum() + out["w_final"].sum()

    float(stream_fn(jnp.asarray(make_stream(H, W, T, rng, 0))))  # compile
    ts = []
    for i in range(5):
        frames = jnp.asarray(make_stream(H, W, T, rng, 7 * (i + 1)))
        t0 = time.perf_counter()
        float(stream_fn(frames))
        ts.append(time.perf_counter() - t0)
    stream_s = float(np.median(ts))
    rows["stream_fps"] = (T - 1) / stream_s
    rows["stream_ms_per_frame"] = stream_s / (T - 1) * 1e3
    print(f"# stream_masks: {(T-1)/stream_s:.1f} fps "
          f"({stream_s/(T-1)*1e3:.3f} ms/frame, one program)", flush=True)

    # -- chunked streaming (bounded memory, state carried) ------------
    def chunked_call(frames_np):
        out = stream_masks_chunked(frames_np, cfg, sim, chunk_pairs=32)
        return float(np.asarray(out["masks"]).astype(np.int64).sum())

    chunked_call(make_stream(H, W, T, rng, 3))  # compile
    ts = []
    for i in range(3):
        frames = make_stream(H, W, T, rng, 11 * (i + 1))
        t0 = time.perf_counter()
        chunked_call(frames)
        ts.append(time.perf_counter() - t0)
    chunk_s = float(np.median(ts))
    rows["chunked_fps"] = (T - 1) / chunk_s
    rows["chunked_chunk"] = 32
    print(f"# stream_masks_chunked(32): {(T-1)/chunk_s:.1f} fps", flush=True)

    # -- offline replay (reference loop shape: one dispatch per pair) --
    @jax.jit
    def replay_step(mem, prev, nxt):
        out = seg_step(mem, prev, nxt, cfg)
        return out["mask"].astype(jnp.int32).sum()

    frames0 = make_stream(H, W, T, rng, 5)
    stream_out = stream_masks(jnp.asarray(frames0), cfg, sim)
    mems = np.asarray(stream_out["mem_gray"])
    float(replay_step(jnp.asarray(mems[0]), jnp.asarray(frames0[0]),
                      jnp.asarray(frames0[1])))  # compile
    n_pairs = 24  # enough for a stable per-pair median at ~30 ms/dispatch
    ts = []
    for i in range(n_pairs):
        frames = make_stream(H, W, 2, rng, 100 + i)
        m = jnp.asarray(mems[i % (T - 1)])
        t0 = time.perf_counter()
        float(replay_step(m, jnp.asarray(frames[0]), jnp.asarray(frames[1])))
        ts.append(time.perf_counter() - t0)
    replay_s = float(np.median(ts))
    rows["replay_fps"] = 1.0 / replay_s
    rows["replay_ms_per_frame"] = replay_s * 1e3
    rows["stream_speedup_vs_replay"] = rows["stream_fps"] / rows["replay_fps"]
    print(f"# offline replay: {1/replay_s:.1f} fps "
          f"({replay_s*1e3:.1f} ms/pair, per-pair dispatches)", flush=True)

    out = REPO / "results" / "stream_bench.json"
    out.write_text(json.dumps(rows, indent=1))
    print(json.dumps({
        "metric": "stream_one_program_fps",
        "value": round(rows["stream_fps"], 1),
        "unit": "frames/s",
        "speedup_vs_offline_replay": round(
            rows["stream_speedup_vs_replay"], 1),
        "written": str(out),
    }))


if __name__ == "__main__":
    main()
