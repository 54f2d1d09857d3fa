import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
"""Per-kernel costs via chained calls in one jit, unique inputs per call.

Usage: python _profile_bench.py [substring-filter] [B]
"""
import sys
import time
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

from nsof_tpu.ops.farneback import PRESETS
from nsof_tpu.ops.farneback_fast import (
    poly_expansion_fast, update_matrices_pallas,
    box_solve_pallas, farneback_fast,
)

sel = sys.argv[1] if len(sys.argv) > 1 else ""
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
H, W = 256, 384
params = PRESETS["grasp"]
rng = np.random.default_rng(0)
NV = 3


def timed(fn, inputs, iters=4):
    for x in inputs[:2]:
        jax.block_until_ready(fn(*x))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        o = fn(*inputs[i % len(inputs)])
        float(jax.tree.leaves(o)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def chain(fn_one, k):
    def f(*args):
        out = args
        for _ in range(k):
            out = fn_one(*out)
        return out
    return jax.jit(f)


def pe1(x):
    r = poly_expansion_fast(x, params.poly_n, params.poly_sigma)
    return (r.mean(-1),)

def um_sep(r0, r1, f):
    m = update_matrices_pallas(r0, r1, f, 3, separable=True)
    return (m, r1, f)

def um_ns(r0, r1, f):
    m = update_matrices_pallas(r0, r1, f, 3, separable=False)
    return (m, r1, f)

def bs1(m):
    f = box_solve_pallas(m, params.winsize)
    return (m + f.sum(-1, keepdims=True) * 1e-9,)

def fb_sep(p, n):
    f = farneback_fast(p, n, params, 3, "pallas_sep")
    return (p + (f.sum() * 1e-12).astype(p.dtype), n)


cases = []
if not sel or "poly" in sel:
    imgs = [jnp.asarray(rng.random((H, W, B)).astype(np.float32))
            for _ in range(NV)]
    cases.append(("poly_expansion", pe1, [(x,) for x in imgs]))
if not sel or "update" in sel:
    r0 = jnp.asarray(rng.random((H, W, B, 5)).astype(np.float32))
    r1 = jnp.asarray(rng.random((H, W, B, 5)).astype(np.float32))
    flows = [jnp.asarray(rng.random((H, W, B, 2)).astype(np.float32) * 2 - 1)
             for _ in range(NV)]
    cases.append(("update_matrices sep r=3", um_sep,
                  [(r0, r1, f) for f in flows]))
    cases.append(("update_matrices nonsep r=3", um_ns,
                  [(r0, r1, f) for f in flows]))
if not sel or "box" in sel:
    ms = [jnp.asarray(rng.random((H, W, B, 5)).astype(np.float32))
          for _ in range(NV)]
    cases.append(("box_solve w=15", bs1, [(m,) for m in ms]))
if not sel or "farneback" in sel:
    base = rng.random((H + 8, W + 8)).astype(np.float32) * 255
    prevs = [jnp.asarray(np.stack([base[v:v + H, 0:W]] * B).astype(np.uint8))
             for v in range(NV)]
    nxts = [jnp.asarray(np.stack([base[v + 2:v + 2 + H, 1:1 + W]] * B)
                        .astype(np.uint8)) for v in range(NV)]
    cases.append(("farneback_fast sep e2e", fb_sep,
                  [(p, n) for p, n in zip(prevs, nxts)]))

for name, f1, inputs in cases:
    t1 = timed(chain(f1, 1), inputs)
    t2 = timed(chain(f1, 2), inputs)
    print(f"{name:30s} B={B} t1={t1:7.2f}  t2={t2:7.2f}  "
          f"per-call={t2 - t1:7.2f} ms")
