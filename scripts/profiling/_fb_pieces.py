import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
"""Bisect the lv0,it1 farneback path piece by piece at B=256."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from nsof_tpu.ops.farneback import (
    PRESETS, _gaussian_blur_kernel, _cv_round,
)
from nsof_tpu.ops.farneback_fast import (
    poly_expansion_fast, update_matrices_pallas, box_solve_pallas,
    _blur_valid,
)

H, W, B = 256, 384, 256
params = PRESETS["grasp"]
rng = np.random.default_rng(0)
base = rng.random((H + 8, W + 8)).astype(np.float32) * 255
NV = 3
prevs = [jnp.asarray(np.stack([base[v:v + H, 0:W]] * B).astype(np.uint8))
         for v in range(NV)]
r0s = [jnp.asarray(rng.random((H, W, B, 5)).astype(np.float32))
       for _ in range(2)]
flows = [jnp.asarray((rng.random((H, W, B, 2)) * 2 - 1).astype(np.float32))
         for _ in range(NV)]
ms_ = [jnp.asarray(rng.random((H, W, B, 5)).astype(np.float32))
       for _ in range(NV)]


def t(f, inputs):
    jf = jax.jit(f)
    for i in range(2):
        jax.block_until_ready(jf(*inputs[i % len(inputs)]))
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        o = jf(*inputs[i % len(inputs)])
        float(jax.tree.leaves(o)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


# 1. u8 [B,H,W] -> f32 [H,W,B] transpose
print(f"transpose+cast     {t(lambda p: jnp.asarray(p, jnp.float32).transpose(1,2,0).sum(), [(p,) for p in prevs]):8.2f}")

# 2. gaussian blur (smooth_sz=3 at lv0? sigma=0 -> sz 3)
k3 = _gaussian_blur_kernel(3, 0.0 if True else 1)
imgs = [jnp.asarray(p, jnp.float32).transpose(1, 2, 0) for p in prevs]
print(f"blur sz3           {t(lambda x: _blur_valid(jnp.pad(x, ((1,1),(1,1),(0,0)), mode='reflect'), k3).sum(), [(x,) for x in imgs]):8.2f}")

# 3. poly expansion
print(f"poly               {t(lambda x: poly_expansion_fast(x, params.poly_n, params.poly_sigma).sum(), [(x,) for x in imgs]):8.2f}")

# 4. update (sep)
print(f"update sep         {t(lambda r0, r1, f: update_matrices_pallas(r0, r1, f, 3, separable=True).sum(), [(r0s[0], r0s[1], f) for f in flows]):8.2f}")

# 5. box solve
print(f"box_solve          {t(lambda m: box_solve_pallas(m, params.winsize).sum(), [(m,) for m in ms_]):8.2f}")

# 6. final transpose flow [H,W,B,2]->[B,H,W,2]
print(f"flow transpose     {t(lambda f: f.transpose(2,0,1,3).sum(), [(f,) for f in flows]):8.2f}")

# 7. zeros flow init
print(f"zeros              {t(lambda f: (jnp.zeros((H,W,B,2), jnp.float32) + f).sum(), [(f,) for f in flows]):8.2f}")
