"""Synaptic-transistor (memristor) device model.

Vectorised JAX implementation of the nonlinear ion-drift device model used by
the reference simulators (frame-driven MATLAB
``simulation/simulationcode_v4_transistor_uav.m:173-236`` and event-driven
``eventsim/event_mem_sim.py:40-63``).  State ``w`` lives in [0, 1]; a voltage
below ``voff`` drives the OFF transition, above ``von`` the ON transition:

    dw/dt = k_off * (V/v_off - 1)^alpha_off * (1 - w*s_off)^b_off   (V < v_off)
    dw/dt = k_on  * (V/v_on  - 1)^alpha_on  * (1 - w*s_on )^b_on    (V > v_on)
    dw/dt = 0                                                        otherwise

followed by an Euler step and a hard window clamp to [0, 1].
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# Integration timestep [s] shared by both reference simulators
# (eventsim/event_mem_sim.py:30, simulationcode_v4_transistor_uav.m:55).
DT = 5e-4


@dataclasses.dataclass(frozen=True)
class DeviceParams:
    """Physical constants of the 2-D vdW synaptic transistor.

    Defaults match the reference (eventsim/event_mem_sim.py:20-27 and the
    MATLAB ``params`` struct, simulationcode_v4_transistor_uav.m:26-33).
    """

    alpha_off: float = 1.0
    alpha_on: float = 1.0
    v_off: float = -0.2
    v_on: float = 0.1
    k_off: float = 51.03
    k_on: float = -2.91
    s_on: float = 0.2
    s_off: float = 0.8
    b_on: float = -5.12
    b_off: float = 3.10
    r_on: float = 163_305.0
    r_off: float = 2_104_377.0
    w_on: float = 1.0
    w_off: float = 0.0
    w_init: float = 0.5

    @property
    def lam(self) -> float:
        """Exponential resistance-map constant λ = ln(Roff/Ron)."""
        import math

        return math.log(self.r_off / self.r_on)


DEFAULT_PARAMS = DeviceParams()


def dwdt(w: Array, v: Array, p: DeviceParams = DEFAULT_PARAMS) -> Array:
    """Window-modulated state derivative, fully vectorised.

    Both branches are evaluated densely and selected with ``where`` — there is
    no data-dependent control flow, so the op fuses under ``jit``.
    """
    w = jnp.asarray(w, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    off = v < p.v_off
    on = v > p.v_on
    # Guard the power bases so the inactive branch never produces NaN/Inf.
    # For w in [0,1] the (1 - w*s)^b terms are well defined, but (V/v - 1)
    # can go negative on the inactive branch; clamp it to 0 there.
    drive_off = jnp.maximum(v / p.v_off - 1.0, 0.0)
    drive_on = jnp.maximum(v / p.v_on - 1.0, 0.0)
    win_off = jnp.power(1.0 - w * p.s_off, p.b_off)
    win_on = jnp.power(1.0 - w * p.s_on, p.b_on)
    d_off = p.k_off * jnp.power(drive_off, p.alpha_off) * win_off
    d_on = p.k_on * jnp.power(drive_on, p.alpha_on) * win_on
    return jnp.where(off, d_off, jnp.where(on, d_on, 0.0))


def update_state(
    w: Array, v: Array, p: DeviceParams = DEFAULT_PARAMS, dt: float = DT
) -> Array:
    """One Euler step of the device state with window clamp to [0, 1].

    Equivalent to the reference's ``update_state``
    (eventsim/event_mem_sim.py:40-57).
    """
    return jnp.clip(w + dwdt(w, v, p) * dt, 0.0, 1.0)


def resistance_exp(w: Array, p: DeviceParams = DEFAULT_PARAMS) -> Array:
    """Map state w∈[0,1] to resistance on an exponential curve.

    R = Ron / exp(-λ (1 - w)), λ = ln(Roff/Ron)
    (eventsim/event_mem_sim.py:60-63; calculate_resistances_exp,
    simulationcode_v4_transistor_uav.m:233-236).
    """
    return p.r_on / jnp.exp(-p.lam * (1.0 - jnp.asarray(w, jnp.float32)))


def resistance_linear(w: Array, p: DeviceParams = DEFAULT_PARAMS) -> Array:
    """Linear state→resistance map (calculate_resistances_linear, .m:229-231)."""
    return p.r_on + (p.r_off - p.r_on) * jnp.asarray(w, jnp.float32)


def state_from_resistance(r: Array, p: DeviceParams = DEFAULT_PARAMS) -> Array:
    """Invert :func:`resistance_exp`: w = 1 - ln(R/Ron)/λ.

    Matches the visualizer's ``_resistance_to_state_w``
    (eventsim/visualize_npz_keyframes.py:30-33).
    """
    return 1.0 - jnp.log(jnp.asarray(r, jnp.float32) / p.r_on) / p.lam


def conductance_to_gray(g: Array) -> Array:
    """Conductance map → uint8 grayscale used by every reference pipeline.

    gray = clip(-3366 / log10(G) - 306, 0, 255) as uint8
    (optical_flow_seg.py:426-435).  ``G`` is a conductance in siemens
    (~1e-7..1e-5), so log10 is negative and the result increases with G.
    Non-positive inputs map to 0 (the reference relies on numpy emitting
    NaN under errstate suppression; we make the behaviour explicit).
    """
    # float64 only when x64 mode is enabled; conductances (1e-11..1e-5 S)
    # are well inside float32 range and the output is quantised to uint8
    if not jax.config.jax_enable_x64:
        g = jnp.asarray(g, jnp.float32)
    else:
        g = jnp.asarray(g)
    logg = jnp.log10(jnp.where(g > 0, g, 1.0))
    val = jnp.where(g > 0, -3366.0 / logg - 306.0, 0.0)
    return jnp.clip(val, 0.0, 255.0).astype(jnp.uint8)


def modulate_voltage(v: Array, a: float = 0.3, b: float = 0.0,
                     c: float = 3.0, d: float = -3.0) -> Array:
    """Piecewise-linear drive-voltage modulation, then global sign flip.

    Matches MATLAB ``modulatefunc`` (simulationcode_v4_transistor_uav.m:332-347):
    v_mod = -(a*V + b) for V > 0, -(c*V + d) for V < 0.  The reference leaves
    v_mod *undefined* for V == 0; we define it as -(a*0 + b) = -b, which for
    the default b=0 equals the continuous limit from above.
    """
    v = jnp.asarray(v, jnp.float32)
    pos = a * v + b
    neg = c * v + d
    return -jnp.where(v > 0, pos, jnp.where(v < 0, neg, b))


def difference_voltage(
    prev: Array,
    curr: Array,
    th1: float,
    th2: float,
) -> Array:
    """Piecewise-linear |Δ|→voltage transfer of the frame-driven simulator.

    Matches ``calculate_difference_matrix`` + ``func1/2/3``
    (simulationcode_v4_transistor_uav.m:146-171):

        d = |curr - prev|
        d <= th1        → (d - 5.5) * 0.6
        th1 < d <= th2  → (d + 4) * 0.75
        d > th2         → (d + 4) * 0.75      (func3 == func2 in v4)
    """
    d = jnp.abs(jnp.asarray(curr, jnp.float32) - jnp.asarray(prev, jnp.float32))
    low = (d - 5.5) * 0.6
    high = (d + 4.0) * 0.75
    return jnp.where(d <= th1, low, high)
