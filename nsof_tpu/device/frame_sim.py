"""Frame-driven memristor-array simulator.

TPU-native replacement for the MATLAB pipeline
``simulation/simulationcode_v4_transistor_{uav,vehicle}.m``: consecutive
grayscale frames are cropped, Lanczos-3 downsampled onto the device grid,
converted to a drive voltage through a piecewise |Δ| transfer and the
modulation function, then integrated with ``nSubSteps`` Euler sub-steps per
frame.  The per-pixel double loop of the reference
(simulate_memristor_array, .m:187-227) becomes a ``lax.scan`` over frames with
a vectorised ``fori_loop`` over sub-steps — the whole simulation is one XLA
program with no host round-trips.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from nsof_tpu.device.model import (
    DEFAULT_PARAMS,
    DeviceParams,
    difference_voltage,
    modulate_voltage,
    resistance_exp,
    update_state,
)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class FrameSimConfig:
    """Configuration mirroring the MATLAB script constants.

    ``m``/``n`` are the downsample factors (px per device cell) and ``th1``/
    ``th2`` the |Δ| thresholds (simulationcode_v4_transistor_uav.m:37-41;
    vehicle variant uses m=n=200, th1=2, .m:38-51).
    """

    m: int = 40
    n: int = 40
    th1: float = 0.7
    th2: float = 1.5
    dt: float = 5e-4
    n_substeps: int = 1000
    params: DeviceParams = DEFAULT_PARAMS


def compress_frames(
    frames: Array,
    m: int,
    n: int,
    region_ul: Optional[tuple[int, int]] = None,
    region_lr: Optional[tuple[int, int]] = None,
) -> Array:
    """Crop to the processing region and Lanczos-3 downsample to the grid.

    Equivalent to ``crop_image`` + ``compress_image``
    (simulationcode_v4_transistor_uav.m:104-121): output grid is
    ``(floor(H/n), floor(W/m))``; values stay in [0, 1] (im2double).

    Args:
        frames: [T, H, W] float array in [0, 1] (grayscale frames).
        region_ul/region_lr: inclusive [y, x] corners of the crop, 0-based
            (the MATLAB script uses 1-based inclusive indices).
    """
    if region_ul is not None and region_lr is not None:
        y0, x0 = region_ul
        y1, x1 = region_lr
        frames = frames[:, y0 : y1 + 1, x0 : x1 + 1]
    t, h, w = frames.shape
    gh, gw = h // n, w // m
    return jax.image.resize(
        frames.astype(jnp.float32), (t, gh, gw), method="lanczos3", antialias=True
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def simulate_frames(
    compressed: Array,
    cfg: FrameSimConfig = FrameSimConfig(),
) -> dict[str, Array]:
    """Run the device over a sequence of compressed frames.

    Jitted as one program (config static): the whole frame-driven
    simulation is a single device dispatch, like ``simulate_events``.

    Mirrors ``simulate_memristor_array`` (simulationcode_v4_transistor_uav.m:
    187-227): per frame pair the |Δ| map (scaled by 256) goes through the
    piecewise transfer and ``modulatefunc`` and the state is integrated for
    ``n_substeps`` Euler sub-steps of ``dt / n_substeps``.

    Args:
        compressed: [T, gh, gw] float frames in [0, 1] on the device grid.

    Returns:
        dict with
        ``w_final``        [gh, gw]    final state,
        ``resistances``    [T, gh, gw] exponential resistance map after every
                                       frame, including the initial state
                                       (the reference stores T entries: the
                                       initial map plus one per frame pair),
        ``diff_voltages``  [T-1, gh, gw] the modulated drive voltages,
        ``value_matrices`` [T-1, gh, gw] raw |Δ|*256 maps.
    """
    p = cfg.params
    compressed = jnp.asarray(compressed, jnp.float32)
    scaled = compressed * 256.0  # MATLAB: double(img)*256 (.m:204)
    dt_sub = cfg.dt / cfg.n_substeps

    w0 = jnp.full(compressed.shape[1:], p.w_init, jnp.float32)

    def step(w, pair):
        prev, curr = pair
        v_raw = difference_voltage(prev, curr, cfg.th1, cfg.th2)
        v_mod = modulate_voltage(v_raw)
        value = jnp.abs(curr - prev)

        def substep(_, w):
            return update_state(w, v_mod, p, dt_sub)

        w = jax.lax.fori_loop(0, cfg.n_substeps, substep, w)
        return w, (resistance_exp(w, p), v_mod, value)

    pairs = (scaled[:-1], scaled[1:])
    w_final, (res, vmod, value) = jax.lax.scan(step, w0, pairs)
    res0 = resistance_exp(w0, p)[None]
    return {
        "w_final": w_final,
        "resistances": jnp.concatenate([res0, res], axis=0),
        "diff_voltages": vmod,
        "value_matrices": value,
    }


def simulate_frames_fast(
    compressed: Array, cfg: FrameSimConfig = FrameSimConfig()
) -> dict[str, Array]:
    """Single-substep variant (the MATLAB 'fast simulation' toggle, .m:56-59)."""
    return simulate_frames(compressed, dataclasses.replace(cfg, n_substeps=1))
