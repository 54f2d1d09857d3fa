"""Per-stage attribution of the RAFT forward pass on chip.

The round-4 deep bench measured end-to-end latency only; this script
breaks one RAFT window inference into its stages — the PERF.md Farnebäck
treatment applied to the deep path (reference analogue: the per-stage
timing lists of codebase/RAFT/raft_seg.py:91-98 bracket upload / inference
/ download, and the CUDA kernel alt_cuda_corr exists precisely because the
corr lookup was the hot stage).

Stages (all jitted separately, synchronous scalar-fetch timing, salted
inputs so the tunnel cannot cache):

  encoders    fnet(img1) + fnet(img2) + cnet(img1)
  corr_build  all-pairs volume + 4-level pyramid
  lookup x N  N dense hat-selector corr lookups (gather-free, round 5)
  update x N  N update-block applications (motion encoder + GRU + head)
  upsample xN N convex upsamplings
  full        the complete forward (20 iters, test mode)

Writes results/deep_stage_profile.json.
"""

from __future__ import annotations

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

import jax.numpy as jnp  # noqa: E402

from nsof_tpu.models.raft import (  # noqa: E402
    RAFT,
    RaftConfig,
    SmallEncoder,
    BasicEncoder,
    SmallUpdateBlock,
    BasicUpdateBlock,
    all_pairs_correlation,
    build_corr_pyramid,
    coords_grid,
    corr_lookup,
    upsample_flow_convex,
    upflow8,
)

ITERS = 20


def timed(fn, args, n=8, warmup=2):
    """Synchronous p50 of fn(*args, salt) with a unique salt per call;
    fn must return a scalar (fetched to host each call)."""
    salt = iter(range(1, 10_000))
    for _ in range(warmup):
        float(fn(*args, jnp.float32(next(salt))))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args, jnp.float32(next(salt))))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def profile(small: bool, H=256, W=384):
    cfg = RaftConfig(small=small, iters=ITERS, compute_dtype=jnp.bfloat16)
    model = RAFT(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (1, H, W, 3), dtype=np.uint8))
    params = model.init(jax.random.PRNGKey(0), img, img, iters=1)["params"]

    dt = cfg.compute_dtype
    hdim, cdim = cfg.hidden_dim, cfg.context_dim
    h8, w8 = H // 8, W // 8
    fdim = 128 if small else 256

    if small:
        fnet = SmallEncoder(128, "instance", dt)
        cnet = SmallEncoder(hdim + cdim, "none", dt)
        upd = SmallUpdateBlock(cfg)
    else:
        fnet = BasicEncoder(256, "instance", dt)
        cnet = BasicEncoder(hdim + cdim, cfg.cnet_norm, dt)
        upd = BasicUpdateBlock(cfg)

    def norm(x):
        return (2.0 * (x.astype(jnp.float32) / 255.0) - 1.0).astype(dt)

    @jax.jit
    def enc_stage(im, salt):
        x = norm(im) + salt * 1e-12
        f1 = fnet.apply({"params": params["fnet"]}, x)
        f2 = fnet.apply({"params": params["fnet"]}, x + 1)
        c = cnet.apply({"params": params["cnet"]}, x)
        return (f1.astype(jnp.float32).sum() + f2.astype(jnp.float32).sum()
                + c.astype(jnp.float32).sum())

    fmap = jnp.asarray(
        rng.normal(size=(1, h8, w8, fdim)).astype(np.float32))

    @jax.jit
    def corr_stage(f1, f2, salt):
        pyr = build_corr_pyramid(
            all_pairs_correlation(f1 + salt * 1e-12, f2), cfg.corr_levels)
        return sum(p.sum() for p in pyr)

    pyramid = [
        jnp.asarray(rng.normal(size=(
            h8 * w8, max(h8 >> l, 1), max(w8 >> l, 1), 1)
        ).astype(np.float32))
        for l in range(cfg.corr_levels)
    ]
    coords = coords_grid(1, h8, w8) + 0.37

    @jax.jit
    def lookup_stage(pyr, crd, salt):
        def body(c, _):
            feat = corr_lookup(pyr, c, cfg.corr_radius)
            c = c + feat.mean(axis=-1, keepdims=True)[..., :2] * 1e-6
            return c, None
        c, _ = jax.lax.scan(body, crd + salt * 1e-12, None, length=ITERS)
        return c.sum()

    net0 = jnp.asarray(rng.normal(size=(1, h8, w8, hdim)).astype(np.float32)
                       ).astype(dt)
    inp0 = jnp.asarray(rng.normal(size=(1, h8, w8, cdim)).astype(np.float32)
                       ).astype(dt)
    nlv = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
    corr_feat = jnp.asarray(
        rng.normal(size=(1, h8, w8, nlv)).astype(np.float32)).astype(dt)
    flow8 = jnp.zeros((1, h8, w8, 2), dt)

    @jax.jit
    def update_stage(net, inp, cf, fl, salt):
        def body(n, _):
            n2, mask, delta = upd.apply(
                {"params": params["update_block"]}, n,
                inp, cf + salt.astype(dt) * 1e-12, fl)
            return n2, None
        n, _ = jax.lax.scan(body, net, None, length=ITERS)
        return n.astype(jnp.float32).sum()

    mask0 = jnp.asarray(rng.normal(size=(1, h8, w8, 64 * 9))
                        .astype(np.float32))
    flow_f32 = jnp.zeros((1, h8, w8, 2), jnp.float32)

    @jax.jit
    def upsample_stage(fl, m, salt):
        def body(f, _):
            if small:
                up = upflow8(f + salt * 1e-12)
            else:
                up = upsample_flow_convex(f + salt * 1e-12, m)
            return f + up[:, ::8, ::8] * 1e-6, None
        f, _ = jax.lax.scan(body, fl, None, length=ITERS)
        return f.sum()

    @jax.jit
    def full_stage(i1, i2, salt):
        _, up = model.apply(
            {"params": params},
            (i1.astype(jnp.float32) + salt).astype(jnp.uint8), i2,
            iters=ITERS, test_mode=True)
        return up.sum()

    img2 = jnp.asarray(rng.integers(0, 255, (1, H, W, 3), dtype=np.uint8))

    out = {
        "model": "raft-small" if small else "raft-basic",
        "window_hw": [H, W],
        "iters": ITERS,
        "encoders_ms": timed(enc_stage, (img,)) * 1e3,
        "corr_build_ms": timed(corr_stage, (fmap, fmap)) * 1e3,
        f"lookup_x{ITERS}_ms": timed(lookup_stage, (pyramid, coords)) * 1e3,
        f"update_x{ITERS}_ms": timed(
            update_stage, (net0, inp0, corr_feat, flow8)) * 1e3,
        f"upsample_x{ITERS}_ms": timed(
            upsample_stage, (flow_f32, mask0)) * 1e3,
        "full_forward_ms": timed(full_stage, (img, img2)) * 1e3,
    }
    parts = (out["encoders_ms"] + out["corr_build_ms"]
             + out[f"lookup_x{ITERS}_ms"] + out[f"update_x{ITERS}_ms"]
             + out[f"upsample_x{ITERS}_ms"])
    out["stage_sum_ms"] = parts
    out["unattributed_ms"] = out["full_forward_ms"] - parts
    print(json.dumps(out, indent=1), flush=True)
    return out


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    # dispatch floor: the per-sync overhead of the tunnel itself
    @jax.jit
    def nop(x, salt):
        return (x + salt).sum()

    x = jnp.zeros((8, 128), jnp.float32)
    floor = timed(nop, (x,), n=20) * 1e3
    rows = {"device": str(jax.devices()[0]),
            "dispatch_floor_ms": floor,
            "profiles": [profile(True), profile(False)]}
    out = REPO / "results" / "deep_stage_profile.json"
    out.write_text(json.dumps(rows, indent=1))
    print(json.dumps({"metric": "raft_small_full_forward_ms",
                      "value": rows["profiles"][0]["full_forward_ms"],
                      "dispatch_floor_ms": floor,
                      "written": str(out)}))


if __name__ == "__main__":
    main()
