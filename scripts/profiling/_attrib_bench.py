import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
"""Attribute the bench-config cost: full seg step vs farneback alone vs
levels/iterations sweeps, at the headline B=1536 256x384 configuration."""
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from nsof_tpu.config import DATASETS
from nsof_tpu.ops.farneback_fast import farneback_fast
from nsof_tpu.pipelines.segmentation import seg_batch_fast

H, W = 480, 640
WH, WW = 256, 384
B = 1536
MEMSIZE = 80
cfg = dataclasses.replace(
    DATASETS["grasp"], name="bench640", image_h=H, image_w=W,
    window_h=WH, window_w=WW, warp_radius=3,
)
cfg = dataclasses.replace(cfg, roi=dataclasses.replace(cfg.roi, memsize=MEMSIZE))

rng = np.random.default_rng(0)
base = rng.random((H + 64, W + 64)).astype(np.float32) * 255
NV = 3
prevs = [jnp.asarray(np.stack([base[16 + v:16 + v + H, 16:16 + W]] * B).astype(np.uint8)) for v in range(NV)]
nxts = [jnp.asarray(np.stack([base[18 + v:18 + v + H, 15:15 + W]] * B).astype(np.uint8)) for v in range(NV)]
mem = np.zeros((B, H // MEMSIZE, W // MEMSIZE), np.uint8)
mem[:, 2:4, 3:5] = 255
mem_j = jnp.asarray(mem)

wins_p = [p[:, :WH, :WW] for p in prevs]
wins_n = [p[:, :WH, :WW] for p in nxts]


def timeit(f, args_list, label):
    for i in range(2):
        float(f(*args_list[i % len(args_list)]))
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        float(f(*args_list[i % len(args_list)]))
        ts.append(time.perf_counter() - t0)
    ms = 1e3 * float(np.median(ts))
    print(f"{label:34s} {ms:8.1f} ms   {B/(ms/1e3):7.0f} fps")
    return ms


@jax.jit
def full_step(m, p, n):
    return seg_batch_fast(m, p, n, cfg)["mask"].astype(jnp.int32).sum()

timeit(full_step, list(zip([mem_j]*NV, prevs, nxts)), "full seg step")


def fb_only(params, label, radius=3):
    @jax.jit
    def f(p, n):
        dx, dy = farneback_fast(p, n, params, radius, "fused", out_layout="planes")
        return (dx * dx).sum()
    timeit(f, list(zip(wins_p, wins_n)), label)

p0 = cfg.fb
fb_only(p0, "farneback fused (lv3,it3,r3)")
fb_only(dataclasses.replace(p0, iterations=1), "it1")
fb_only(dataclasses.replace(p0, iterations=2), "it2")
fb_only(dataclasses.replace(p0, levels=0), "lv0 only,it3")
fb_only(dataclasses.replace(p0, levels=1), "lv<=1,it3")
fb_only(dataclasses.replace(p0, levels=2), "lv<=2,it3")
fb_only(p0, "radius2", radius=2)
