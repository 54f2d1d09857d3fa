import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
"""Accuracy + speed of the fused per-iteration kernel path."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from nsof_tpu.ops.farneback import PRESETS, farneback
from nsof_tpu.ops.farneback_fast import farneback_fast

H, W, B = 256, 384, 256
params = PRESETS["grasp"]
rng = np.random.default_rng(0)

base = rng.random((H + 8, W + 8)).astype(np.float32) * 255
NV = 3
prevs = [jnp.asarray(np.stack([base[v:v + H, 0:W]] * B).astype(np.uint8))
         for v in range(NV)]
nxts = [jnp.asarray(np.stack([base[v + 2:v + 2 + H, 1:1 + W]] * B)
                    .astype(np.uint8)) for v in range(NV)]

fl_f = farneback_fast(prevs[0], nxts[0], params, 3, "fused")
fl_s = farneback_fast(prevs[0], nxts[0], params, 3, "pallas_sep")
fl_e = jax.vmap(lambda p, n: farneback(p, n, params))(prevs[0][:1], nxts[0][:1])
epe_fs = np.asarray(jnp.sqrt(((fl_f - fl_s) ** 2).sum(-1)))
epe_fe = np.asarray(jnp.sqrt(((fl_f[:1] - fl_e) ** 2).sum(-1)))
print(f"EPE fused-vs-sep mean={epe_fs.mean():.5f} max={epe_fs.max():.4f}")
print(f"EPE fused-vs-exact mean={epe_fe.mean():.5f} max={epe_fe.max():.4f}")

for mode in ("fused",):
    @jax.jit
    def f(a, b):
        return farneback_fast(a, b, params, 3, mode).sum()
    for i in range(2):
        float(f(prevs[i], nxts[i]))
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(f(prevs[i % NV], nxts[i % NV]))
        ts.append(time.perf_counter() - t0)
    print(f"{mode:12s} e2e {1e3*float(np.median(ts)):8.2f} ms (incl ~40ms dispatch)")
