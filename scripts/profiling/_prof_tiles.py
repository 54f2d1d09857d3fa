import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
"""Fused-kernel cost vs tile height (with raised VMEM limit)."""
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
rng = np.random.default_rng(0)


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


for th, tw in [(16, 32), (32, 32), (48, 32), (64, 32), (32, 64)]:
    hp = -(-HK // th) * th
    wp = -(-WK // tw) * tw
    r0t = jnp.asarray(rng.random((5, hp, wp, B)).astype(np.float32))
    r1p = jnp.asarray(
        rng.random((5, hp + 2 * e, wp + 16, B)).astype(np.float32))
    bscp = jnp.asarray(rng.random((hp, wp, 1)).astype(np.float32))
    ms = [jnp.asarray(rng.random((5, hp, wp, B)).astype(np.float32))
          for _ in range(3)]

    def fus_m(m, th=th, tw=tw, r1p=r1p, r0t=r0t, bscp=bscp):
        return (ff._fused_box_update_cm(
            m, r0t, bscp, r1p, params.winsize, radius, "matrices",
            th, tw),)

    try:
        t = timed(fus_m, [(m,) for m in ms])
        print(f"th={th:2d} tw={tw:2d}  fused_matrices per-call = {t:7.2f} ms",
              flush=True)
    except Exception as exc:
        print(f"th={th:2d} tw={tw:2d}  FAILED: {str(exc)[:200]}", flush=True)
