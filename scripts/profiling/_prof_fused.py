import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
"""Per-kernel cost of the fused-path kernels via chained jit diffs."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from nsof_tpu.ops.farneback import PRESETS
from nsof_tpu.ops import farneback_fast as ff

B = 256
HK, WK = 256, 384
params = PRESETS["grasp"]
radius = 3
e = radius + 1
th, tw = ff.FUSED_TH, ff.FUSED_TW
hp = -(-HK // th) * th
wp = -(-WK // tw) * tw
rng = np.random.default_rng(0)

r0t = jnp.asarray(rng.random((5, hp, wp, B)).astype(np.float32))
r1p = jnp.asarray(rng.random((5, hp + 2 * e, wp + 16, B)).astype(np.float32))
bscp = jnp.asarray(rng.random((hp, wp, 1)).astype(np.float32))
dxt = jnp.asarray((rng.random((hp, wp, B)) * 2 - 1).astype(np.float32))
dyt = jnp.asarray((rng.random((hp, wp, B)) * 2 - 1).astype(np.float32))
dxrp = jnp.asarray((rng.random((hp + 2 * e, wp, B)) * 2 - 1).astype(np.float32))
ms = [jnp.asarray(rng.random((5, hp, wp, B)).astype(np.float32))
      for _ in range(3)]


def timed(fn_one, inputs):
    def chain(k):
        def f(*args):
            out = args
            for _ in range(k):
                out = fn_one(*out)
            return out
        return jax.jit(f)
    res = []
    for k in (1, 2):
        c = chain(k)
        for x in inputs[:2]:
            jax.block_until_ready(c(*x))
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            o = c(*inputs[i % len(inputs)])
            float(jax.tree.leaves(o)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        res.append(1e3 * float(np.median(ts)))
    return res[1] - res[0]


def upd(m):
    return (ff._update_matrices_sep_cm(
        dxt, dyt, r0t, bscp, r1p, dxrp, radius, th, tw) + m * 1e-9,)

def fus_m(m):
    return (ff._fused_box_update_cm(
        m, r0t, bscp, r1p, params.winsize, radius, "matrices", th, tw),)

def fus_f(m):
    fl = ff._fused_box_update_cm(
        m, r0t, bscp, r1p, params.winsize, radius, "flow", th, tw)
    return (m + fl[0:1].mean() * 1e-9,)

sel = sys.argv[1] if len(sys.argv) > 1 else ""
for name, f1 in [("update_cm", upd), ("fused_matrices", fus_m),
                 ("fused_flow", fus_f)]:
    if sel and sel not in name:
        continue
    print(f"{name:16s} per-call = {timed(f1, [(m,) for m in ms]):7.2f} ms")
