"""Batched deep-window throughput sweep: find the serving knee.

Per-frame *sync* deep latency is tunnel-RTT-bound (~29 ms floor; see
results/deep_stage_profile.json), so throughput — not latency — is the
honest measure of the deep path's chip utilisation.  This sweeps the
vmapped-window batch size for RAFT ROI inference (the serving shape:
many concurrent 256×384 windows through one program, the
`serve/engine.py` pattern) and reports fps + MFU per batch size.

Reference analogue: the reference runs its deep backends one window per
forward (raft_seg.py:91-98, batch dimension unused); a TPU serves
windows in batch.  Writes results/deep_batch_sweep.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V5E_BF16_PEAK = 197e12


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0)) if ca else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only", default=None,
        help="run a single impl and merge its rows into the existing "
             "results JSON (other rows kept as previously measured)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from nsof_tpu.config import DATASETS
    from nsof_tpu.models.raft import RAFT, RaftConfig
    from nsof_tpu.pipelines.deep_flow import (
        DeepBackend,
        deep_roi_flow_batch,
        deep_roi_flow_step,
    )

    H, W = 480, 640
    cfg = dataclasses.replace(
        DATASETS["grasp"], name="deepsweep", image_h=H, image_w=W,
        window_h=256, window_w=384,
    )
    rng = np.random.default_rng(0)
    base = rng.random((H + 64, W + 64, 3)).astype(np.float32) * 255
    ms_deep = max(cfg.roi.memsize // 3, 1)
    mem = np.zeros((H // ms_deep, W // ms_deep), np.uint8)
    mem[3:6, 4:7] = 255
    mem = jnp.asarray(mem)

    results = {"device": str(jax.devices()[0]),
               "window_hw": [256, 384], "frame_hw": [H, W],
               "model": "raft-small iters=20 bf16"
                        " (structured_ff row: flowformer things_eval)",
               "rows": []}

    mcfg = RaftConfig(small=True, iters=20, compute_dtype=jnp.bfloat16)
    model = RAFT(mcfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy, iters=1)[
        "params"]
    backend = DeepBackend.from_raft(model, params, iters=20)

    # alternate-corr variant: windowed on-the-fly correlation, never
    # materialises the [B,N,h,w] all-pairs volume (HBM traffic)
    mcfg_alt = dataclasses.replace(mcfg, corr_mode="alternate")
    model_alt = RAFT(mcfg_alt)
    backend_alt = DeepBackend.from_raft(model_alt, params, iters=20)

    def make_ff_backend():
        from nsof_tpu.models.flowformer import FlowFormer
        from nsof_tpu.models.flowformer.config import get_experiment

        fcfg = dataclasses.replace(
            get_experiment("things_eval").model,
            compute_dtype=jnp.bfloat16)
        fmodel = FlowFormer(fcfg)
        fdummy = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        fparams = fmodel.init(
            jax.random.PRNGKey(0), fdummy, fdummy)["params"]
        return DeepBackend.from_flowformer(fmodel, fparams)

    def one(m, p, n):
        return deep_roi_flow_step(m, p, n, cfg, backend)["mask"]

    def make_step(impl, B):
        if impl == "vmap_step":
            @jax.jit
            def step(m, p, n, salt):
                p = p.at[:, 0, 0, :].set(salt[:, None])
                masks = jax.vmap(one, in_axes=(None, 0, 0))(m, p, n)
                return masks.astype(jnp.int32).sum()
            return step
        if impl in ("structured", "structured_altcorr", "structured_ff"):
            be = {"structured": backend,
                  "structured_altcorr": backend_alt,
                  "structured_ff": make_ff_backend()}[impl]
            memsB = jnp.broadcast_to(mem, (B,) + mem.shape)

            @jax.jit
            def step(m, p, n, salt):
                p = p.at[:, 0, 0, :].set(salt[:, None])
                out = deep_roi_flow_batch(memsB, p, n, cfg, be)
                return out["mask"].astype(jnp.int32).sum()
            return step
        if impl == "model_only":
            # bound: the backend alone on pre-cropped windows
            @jax.jit
            def step(m, p, n, salt):
                p = p.at[:, 0, 0, :].set(salt[:, None])
                flow = backend.apply(p[:, :256, :384], n[:, :256, :384])
                return flow.sum()
            return step
        raise ValueError(impl)

    sweeps = [
        ("vmap_step", (8, 32, 64)),
        ("structured", (8, 32, 64)),
        ("structured_altcorr", (32,)),
        ("structured_ff", (8,)),
        ("model_only", (32,)),
    ]
    if args.only:
        sweeps = [(i, bs) for i, bs in sweeps if i == args.only]
        if not sweeps:
            raise SystemExit(f"unknown impl {args.only!r}")

    for impl, batches in sweeps:
      for B in batches:
        step = make_step(impl, B)

        def make(i):
            ps = np.stack([
                base[16 + (i + j) % 6: 16 + (i + j) % 6 + H, 16: 16 + W]
                for j in range(B)]).astype(np.uint8)
            ns = np.stack([
                base[18 + (i + j) % 6: 18 + (i + j) % 6 + H, 15: 15 + W]
                for j in range(B)]).astype(np.uint8)
            return jnp.asarray(ps), jnp.asarray(ns)

        salt_ctr = iter(range(1, 100_000))

        def salts():
            return jnp.asarray(
                [next(salt_ctr) % 251 for _ in range(B)], jnp.uint8)

        pb, nb = make(0)
        t0 = time.perf_counter()
        compiled = step.lower(mem, pb, nb, salts()).compile()
        compile_s = time.perf_counter() - t0
        flops = _flops_of(compiled)
        float(step(mem, pb, nb, salts()))  # warm the jit cache
        batches = [make(i) for i in range(3)]
        rounds = 8
        # pipelined: enqueue all, fetch at the end (serving pattern)
        t0 = time.perf_counter()
        outs = [step(mem, *batches[i % 3], salts()) for i in range(rounds)]
        for o in outs:
            float(o)
        dt = time.perf_counter() - t0
        fps = rounds * B / dt
        mfu = flops * rounds / dt / V5E_BF16_PEAK
        row = {"impl": impl, "batch": B, "fps_pipelined": fps,
               "ms_per_frame": dt / rounds / B * 1e3,
               "ms_per_batch": dt / rounds * 1e3,
               "gflops_per_batch": flops / 1e9,
               "mfu": mfu, "compile_s": compile_s}
        results["rows"].append(row)
        print(f"# {impl} B={B}: {fps:.1f} fps, {mfu*100:.2f}% MFU, "
              f"{dt/rounds*1e3:.1f} ms/batch", flush=True)

    out = REPO / "results" / "deep_batch_sweep.json"
    if args.only and out.exists():
        prev = json.loads(out.read_text())
        fresh = {(r["impl"], r["batch"]) for r in results["rows"]}
        kept = [r for r in prev.get("rows", [])
                if (r["impl"], r["batch"]) not in fresh]
        results["rows"] = kept + results["rows"]
    out.write_text(json.dumps(results, indent=1))
    best = max(
        (r for r in results["rows"] if r["impl"] != "model_only"),
        key=lambda r: r["fps_pipelined"],
    )
    print(json.dumps({
        "metric": "deep_roi_raft_small_batched_fps",
        "value": round(best["fps_pipelined"], 1),
        "unit": "frames/s",
        "impl": best["impl"],
        "batch": best["batch"],
        "mfu": round(best["mfu"], 4),
        "written": str(out),
    }))


if __name__ == "__main__":
    main()
