import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
"""Attribute farneback_fast cost: sweep iterations and levels at B=256."""
import dataclasses
import time
import numpy as np
import jax
import jax.numpy as jnp

from nsof_tpu.ops.farneback import PRESETS
from nsof_tpu.ops.farneback_fast import farneback_fast
import os
MODE = os.environ.get("FB_MODE", "pallas_sep")

H, W, B = 256, 384, 256
base = np.random.default_rng(0).random((H + 8, W + 8)).astype(np.float32) * 255
NV = 3
prevs = [jnp.asarray(np.stack([base[v:v + H, 0:W]] * B).astype(np.uint8))
         for v in range(NV)]
nxts = [jnp.asarray(np.stack([base[v + 2:v + 2 + H, 1:1 + W]] * B)
                    .astype(np.uint8)) for v in range(NV)]
p0 = PRESETS["grasp"]


def t(params):
    @jax.jit
    def f(a, b):
        return farneback_fast(a, b, params, 3, MODE).sum()
    for i in range(2):
        float(f(prevs[i], nxts[i]))
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(f(prevs[i % NV], nxts[i % NV]))
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


for name, params in [
    ("full (lv3,it3)", p0),
    ("it1", dataclasses.replace(p0, iterations=1)),
    ("it2", dataclasses.replace(p0, iterations=2)),
    ("lv0,it3", dataclasses.replace(p0, levels=0)),
    ("lv0,it1", dataclasses.replace(p0, levels=0, iterations=1)),
    ("lv1,it3", dataclasses.replace(p0, levels=1)),
]:
    print(f"{name:16s} {t(params):8.2f} ms")
