"""Frame-driven simulator tests vs a direct numpy transliteration of the
MATLAB reference (simulationcode_v4_transistor_uav.m)."""

import jax.numpy as jnp
import numpy as np

from nsof_tpu.device import FrameSimConfig, compress_frames, simulate_frames
from nsof_tpu.device.model import DEFAULT_PARAMS


def _matlab_oracle(frames, cfg):
    """Per-pixel loop port of simulate_memristor_array (.m:187-227)."""
    p = cfg.params

    def update(w, v, dt):
        if v < p.v_off:
            dwdt = (
                p.k_off
                * (v / p.v_off - 1) ** p.alpha_off
                * (1 - w * p.s_off) ** p.b_off
            )
        elif v > p.v_on:
            dwdt = (
                p.k_on
                * (v / p.v_on - 1) ** p.alpha_on
                * (1 - w * p.s_on) ** p.b_on
            )
        else:
            dwdt = 0.0
        return min(max(w + dwdt * dt, 0.0), 1.0)

    def modulate(v):
        a, b, c, d = 0.3, 0.0, 3.0, -3.0
        out = a * v + b if v > 0 else (c * v + d if v < 0 else 0.0)
        return -out

    t, h, w_ = frames.shape
    w_arr = np.full((h, w_), p.w_init)
    dt_sub = cfg.dt / cfg.n_substeps
    lam = np.log(p.r_off / p.r_on)
    res = [p.r_on / np.exp(-lam * (1 - w_arr))]
    for i in range(t - 1):
        d1 = frames[i] * 256.0
        d2 = frames[i + 1] * 256.0
        diff = np.abs(d1 - d2)
        vmat = np.where(
            diff <= cfg.th1, (diff - 5.5) * 0.6, (diff + 4.0) * 0.75
        )
        for y in range(h):
            for x in range(w_):
                v_mod = modulate(vmat[y, x])
                for _ in range(cfg.n_substeps):
                    w_arr[y, x] = update(w_arr[y, x], v_mod, dt_sub)
        res.append(p.r_on / np.exp(-lam * (1 - w_arr)))
    return w_arr, np.stack(res)


def test_simulate_frames_matches_matlab_oracle(rng):
    frames = rng.random((4, 5, 6)).astype(np.float32)
    cfg = FrameSimConfig(th1=0.7, th2=1.5, n_substeps=10)
    out = simulate_frames(jnp.asarray(frames), cfg)
    w_ref, res_ref = _matlab_oracle(frames.astype(np.float64), cfg)
    np.testing.assert_allclose(
        np.asarray(out["w_final"]), w_ref, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["resistances"]), res_ref, rtol=2e-3
    )
    assert out["resistances"].shape == (4, 5, 6)


def test_static_scene_keeps_initial_state():
    frames = jnp.ones((3, 4, 4)) * 0.5
    out = simulate_frames(frames, FrameSimConfig(n_substeps=5))
    # |Δ|=0 → func1 voltage (0-5.5)*0.6=-3.3 → modulate(-3.3)= -(3*-3.3-3)=12.9>von
    # ⇒ ON drive pushes w down: state must change deterministically, and all
    # pixels identically
    w = np.asarray(out["w_final"])
    assert np.allclose(w, w[0, 0])


def test_compress_frames_grid_shape(rng):
    frames = rng.random((2, 161, 161)).astype(np.float32)
    grid = compress_frames(jnp.asarray(frames), m=40, n=40)
    assert grid.shape == (2, 4, 4)
    grid2 = compress_frames(
        jnp.asarray(frames), m=40, n=40, region_ul=(0, 0), region_lr=(79, 119)
    )
    assert grid2.shape == (2, 2, 3)
