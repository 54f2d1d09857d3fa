"""Device-model unit tests vs closed-form update and reference constants."""

import jax.numpy as jnp
import numpy as np

from nsof_tpu.device import model


def _np_update_state(w, v, p=model.DEFAULT_PARAMS, dt=model.DT):
    """Direct numpy transliteration of the reference's update_state
    (eventsim/event_mem_sim.py:40-57) as oracle."""
    dwdt = np.zeros_like(w, dtype=np.float32)
    mask_off = v < p.v_off
    mask_on = v > p.v_on
    dwdt[mask_off] = (
        p.k_off
        * (v[mask_off] / p.v_off - 1) ** p.alpha_off
        * (1 - w[mask_off] * p.s_off) ** p.b_off
    )
    dwdt[mask_on] = (
        p.k_on
        * (v[mask_on] / p.v_on - 1) ** p.alpha_on
        * (1 - w[mask_on] * p.s_on) ** p.b_on
    )
    return np.clip(w + dwdt * dt, 0.0, 1.0)


def test_update_state_matches_reference_formula(rng):
    w = rng.random((32, 32)).astype(np.float32)
    v = (rng.random((32, 32)) * 16 - 8).astype(np.float32)
    ours = np.asarray(model.update_state(jnp.asarray(w), jnp.asarray(v)))
    ref = _np_update_state(w, v)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_update_state_idle_band_is_identity():
    w = jnp.full((4, 4), 0.37)
    v = jnp.zeros((4, 4))  # voff < 0 < von ⇒ no drive
    np.testing.assert_allclose(np.asarray(model.update_state(w, v)), 0.37)


def test_update_state_clips_to_window():
    w = jnp.asarray([[0.999], [0.001]])
    v_on = jnp.full((2, 1), 8.0)
    v_off = jnp.full((2, 1), -8.0)
    assert float(model.update_state(w, v_off).max()) <= 1.0
    assert float(model.update_state(w, v_on).min()) >= 0.0


def test_resistance_exp_endpoints():
    p = model.DEFAULT_PARAMS
    r0 = float(model.resistance_exp(jnp.asarray(0.0)))
    r1 = float(model.resistance_exp(jnp.asarray(1.0)))
    np.testing.assert_allclose(r0, p.r_off, rtol=1e-5)
    np.testing.assert_allclose(r1, p.r_on, rtol=1e-5)


def test_state_resistance_roundtrip(rng):
    w = rng.random(64).astype(np.float32)
    back = np.asarray(
        model.state_from_resistance(model.resistance_exp(jnp.asarray(w)))
    )
    np.testing.assert_allclose(back, w, atol=1e-4)  # exp/log f32 on TPU


def test_conductance_to_gray_matches_reference_transform(rng):
    # g = clip(-3366/log10(G) - 306, 0, 255).astype(uint8)
    g = (10 ** (rng.random((24, 13)) * 4 - 10)).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        ref = -3366.0 / np.log10(g) - 306.0
    ref = np.clip(ref, 0, 255).astype(np.uint8)
    ours = np.asarray(model.conductance_to_gray(jnp.asarray(g)))
    # allow off-by-one from float32 rounding at bin edges
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_modulate_voltage_matches_matlab():
    v = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    out = np.asarray(model.modulate_voltage(v))
    # MATLAB: a=0.3,b=0,c=3,d=-3, v_mod = -(piecewise)
    expect = -np.asarray([3 * -2.0 - 3, 3 * -0.5 - 3, 0.0, 0.3 * 0.5, 0.3 * 2.0])
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_difference_voltage_piecewise():
    prev = jnp.zeros(4)
    curr = jnp.asarray([0.5, 0.7, 1.0, 2.0])
    out = np.asarray(model.difference_voltage(prev, curr, th1=0.7, th2=1.5))
    expect = np.asarray(
        [(0.5 - 5.5) * 0.6, (0.7 - 5.5) * 0.6, (1.0 + 4) * 0.75, (2.0 + 4) * 0.75]
    )
    np.testing.assert_allclose(out, expect, rtol=1e-6)
