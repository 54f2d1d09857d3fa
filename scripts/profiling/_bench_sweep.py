import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
"""Sweep batch size + breakdown farneback vs full seg step."""
import sys
import time
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from nsof_tpu.config import DATASETS
from nsof_tpu.pipelines.segmentation import seg_batch_fast
from nsof_tpu.ops.farneback import PRESETS
from nsof_tpu.ops.farneback_fast import farneback_fast

H, W = 480, 640
MEMSIZE = 80
cfg = dataclasses.replace(
    DATASETS["grasp"], name="bench640", image_h=H, image_w=W,
    window_h=256, window_w=384,
)
cfg = dataclasses.replace(cfg, roi=dataclasses.replace(cfg.roi, memsize=MEMSIZE))
params = PRESETS["grasp"]

which = sys.argv[1] if len(sys.argv) > 1 else "seg"
Bs = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "256,512").split(",")]

rng = np.random.default_rng(0)
base = rng.random((H + 64, W + 64)).astype(np.float32) * 255


def timeit(step, inputs, iters=8):
    for x in inputs[:2]:
        float(step(*x))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(step(*inputs[i % len(inputs)]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


for B in Bs:
    n_var = 4
    prevs = [jnp.asarray(np.stack([base[16 + v:16 + v + H, 16:16 + W]] * B)
                         .astype(np.uint8)) for v in range(n_var)]
    nxts = [jnp.asarray(np.stack([base[18 + v:18 + v + H, 15:15 + W]] * B)
                        .astype(np.uint8)) for v in range(n_var)]
    mem = np.zeros((B, H // MEMSIZE, W // MEMSIZE), np.uint8)
    mem[:, 2:4, 3:5] = 255
    mem_j = jnp.asarray(mem)

    if which in ("seg", "all"):
        @jax.jit
        def step(m, p, n):
            return seg_batch_fast(m, p, n, cfg)["mask"].astype(jnp.int32).sum()
        t = timeit(step, [(mem_j, p, n) for p, n in zip(prevs, nxts)])
        print(f"B={B} seg_batch_fast: {1e3*t:8.2f} ms/batch  "
              f"{B/t:8.1f} fps  {1e3*t/B:.3f} ms/frame")

    if which in ("fb", "all"):
        # farneback alone on the 256x384 window
        wprevs = [p[:, :256, :384] for p in prevs]
        wnxts = [n[:, :256, :384] for n in nxts]

        @jax.jit
        def fstep(p, n):
            return farneback_fast(p, n, params, 3, "pallas_sep").sum()
        t = timeit(fstep, [(p, n) for p, n in zip(wprevs, wnxts)])
        print(f"B={B} farneback 256x384: {1e3*t:8.2f} ms/batch  "
              f"{B/t:8.1f} fps  {1e3*t/B:.3f} ms/frame")
