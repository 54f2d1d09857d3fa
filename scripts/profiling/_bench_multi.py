import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
"""Amortize the tunnel dispatch floor: k sequential B=256 seg batches
per jit dispatch (chained via a scalar carry so XLA keeps them ordered
and frees each batch's intermediates)."""
import sys
import time
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from nsof_tpu.config import DATASETS
from nsof_tpu.pipelines.segmentation import seg_batch_fast

H, W = 480, 640
MEMSIZE = 80
B = 256
cfg = dataclasses.replace(
    DATASETS["grasp"], name="bench640", image_h=H, image_w=W,
    window_h=256, window_w=384,
)
cfg = dataclasses.replace(cfg, roi=dataclasses.replace(cfg.roi, memsize=MEMSIZE))

ks = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4").split(",")]
rng = np.random.default_rng(0)
base = rng.random((H + 64, W + 64)).astype(np.float32) * 255
NV = 3


def mk(v):
    p = jnp.asarray(np.stack([base[16 + v:16 + v + H, 16:16 + W]] * B).astype(np.uint8))
    n = jnp.asarray(np.stack([base[18 + v:18 + v + H, 15:15 + W]] * B).astype(np.uint8))
    return p, n

mem = np.zeros((B, H // MEMSIZE, W // MEMSIZE), np.uint8)
mem[:, 2:4, 3:5] = 255
mem_j = jnp.asarray(mem)

for k in ks:
    pairs = [mk(v) for v in range(max(k, 2) + NV)]

    @jax.jit
    def step_k(m, *pn):
        tot = jnp.zeros((), jnp.int32)
        for t in range(k):
            p = pn[2 * t] + tot.astype(jnp.uint8) * 0  # order-chain batches
            out = seg_batch_fast(m, p, pn[2 * t + 1], cfg)
            tot = tot + out["mask"].astype(jnp.int32).sum()
        return tot

    def args(i):
        sel = [pairs[(i + t) % len(pairs)] for t in range(k)]
        flat = []
        for p, n in sel:
            flat += [p, n]
        return flat

    for i in range(2):
        float(step_k(mem_j, *args(i)))
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        float(step_k(mem_j, *args(i)))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"k={k}: {1e3*t:8.2f} ms/dispatch  {k*B/t:8.1f} fps  "
          f"{1e3*t/(k*B):.3f} ms/frame")
