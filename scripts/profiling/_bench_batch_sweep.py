"""Sweep bench.py's batch size to map the throughput landscape."""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def run(B):
    import jax
    import jax.numpy as jnp

    from nsof_tpu.config import DATASETS
    from nsof_tpu.pipelines.segmentation import seg_batch_fast

    H, W = 480, 640
    MEMSIZE = 80
    cfg = dataclasses.replace(
        DATASETS["grasp"], name="bench640", image_h=H, image_w=W,
        window_h=256, window_w=384,
    )
    cfg = dataclasses.replace(
        cfg, roi=dataclasses.replace(cfg.roi, memsize=MEMSIZE)
    )
    n_var = 6
    rng = np.random.default_rng(0)
    base = rng.random((H + 64, W + 64)).astype(np.float32) * 255
    prevs, nxts = [], []
    for v in range(n_var):
        prevs.append(jnp.asarray(np.stack(
            [base[16 + v: 16 + v + H, 16: 16 + W]] * B).astype(np.uint8)))
        nxts.append(jnp.asarray(np.stack(
            [base[18 + v: 18 + v + H, 15: 15 + W]] * B).astype(np.uint8)))
    mem = np.zeros((B, H // MEMSIZE, W // MEMSIZE), np.uint8)
    mem[:, 2:4, 3:5] = 255
    mem_j = jnp.asarray(mem)

    @jax.jit
    def step(m, p, n):
        return seg_batch_fast(m, p, n, cfg)["mask"].astype(jnp.int32).sum()

    float(step(mem_j, prevs[0], nxts[0]))
    float(step(mem_j, prevs[1], nxts[1]))
    samples = []
    for i in range(10):
        t0 = time.perf_counter()
        float(step(mem_j, prevs[i % n_var], nxts[(i + 1) % n_var]))
        samples.append(time.perf_counter() - t0)
    per_batch = float(np.median(samples))
    print(f"B={B:4d}  per_batch={per_batch*1e3:8.2f} ms  fps={B/per_batch:8.1f}",
          flush=True)


if __name__ == "__main__":
    for b in [int(x) for x in sys.argv[1:]] or [256, 384, 512]:
        run(b)
