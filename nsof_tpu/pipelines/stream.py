"""Streaming end-to-end pipeline: frames in, ROI-gated masks out.

The reference runs its system in two offline phases — MATLAB integrates
the device state over the whole recording and saves
``constructed_3D_matrix.mat`` (simulation/simulationcode_v4_transistor_*.m),
then each pipeline script reloads it and loops frame pairs on the host
(optical_flow_seg.py:390-622).  On TPU both phases compose into ONE
compiled program:

1. a ``lax.scan`` over frames integrates the synaptic-transistor state
   (carry = ``w``) and emits the per-pair device maps — microseconds per
   step on the tiny grid;
2. the emitted maps gate the batched throughput path
   (:func:`nsof_tpu.pipelines.segmentation.seg_batch_fast`) with the
   *time axis as the lane batch* — every frame pair's windowed Farnebäck
   and segmentation head runs in the same MXU-batched program.

So ``stream_masks`` is the paper's actual deployment shape (camera →
device → ROI → flow → task, continuously) rather than the reference's
offline replay.  For unbounded recordings, :func:`stream_masks_chunked`
carries ``(w, last_frame)`` across fixed-size chunks in bounded memory;
chunked and one-shot results are bit-equal (tested).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from nsof_tpu.config import PipelineConfig
from nsof_tpu.device.frame_sim import FrameSimConfig, compress_frames
from nsof_tpu.device.model import (
    conductance_to_gray,
    difference_voltage,
    modulate_voltage,
    resistance_exp,
    update_state,
)
from nsof_tpu.pipelines.segmentation import seg_batch_fast

Array = jnp.ndarray


def _scan_device_maps(
    frames01: Array, sim: FrameSimConfig, w0: Array
) -> tuple[Array, Array]:
    """Integrate the device over [T, gh, gw] compressed frames.

    Returns (w_final, mem_gray [T-1, gh, gw] uint8) where ``mem_gray[t]``
    is the conductance→gray transform of the state *after* integrating
    pair (t, t+1) — the reference's ``memimg2`` gating map for pair t
    (optical_flow_seg.py:417/219).
    """
    p = sim.params
    scaled = jnp.asarray(frames01, jnp.float32) * 256.0
    dt_sub = sim.dt / sim.n_substeps

    def step(w, pair):
        prev, curr = pair
        v_mod = modulate_voltage(
            difference_voltage(prev, curr, sim.th1, sim.th2)
        )

        def substep(_, w):
            return update_state(w, v_mod, p, dt_sub)

        w = jax.lax.fori_loop(0, sim.n_substeps, substep, w)
        return w, conductance_to_gray(1.0 / resistance_exp(w, p))

    w_final, mem_gray = jax.lax.scan(step, w0, (scaled[:-1], scaled[1:]))
    return w_final, mem_gray


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sim", "warp_radius", "kernel_mode",
                     "return_flow"),
)
def stream_masks(
    frames_gray: Array,
    cfg: PipelineConfig,
    sim: FrameSimConfig = FrameSimConfig(),
    w0: Optional[Array] = None,
    warp_radius: int | None = None,
    kernel_mode: str = "auto",
    return_flow: bool = False,
) -> dict[str, Array]:
    """Frames → device-state scan → ROI-gated batched seg masks.

    Args:
        frames_gray: [T, H, W] uint8 grayscale stream, T ≥ 2.
        cfg: dataset pipeline preset (ROI thresholds, window, Farnebäck
            params).  ``cfg.roi.memsize`` must equal ``sim.m``/``sim.n``
            for the grid → image scaling to line up.
        sim: device-integration constants (MATLAB parameter struct).
        w0: [gh, gw] initial state (default ``w_init``); pass the previous
            chunk's ``w_final`` to continue a stream.
        return_flow: also return the scattered full-image ``flow``
            [T-1, H, W, 2] (negated Farnebäck convention,
            optical_flow_seg.py:461; zeros outside the ROI).

    Returns dict with ``masks`` [T-1, H, W] u8, ``boxes`` [T-1, 4],
    ``any_active`` [T-1], ``region_pct`` [T-1], ``mem_gray`` [T-1, gh, gw]
    and ``w_final`` [gh, gw].
    """
    frames_gray = jnp.asarray(frames_gray)
    t, h, w = frames_gray.shape
    comp = compress_frames(
        frames_gray.astype(jnp.float32) / 255.0, sim.m, sim.n
    )
    if w0 is None:
        w0 = jnp.full(comp.shape[1:], sim.params.w_init, jnp.float32)
    w_final, mem_gray = _scan_device_maps(comp, sim, w0)

    out = seg_batch_fast(
        mem_gray,
        frames_gray[:-1],
        frames_gray[1:],
        cfg,
        warp_radius,
        kernel_mode,
        return_flow=return_flow,
    )
    res = {
        "masks": out["mask"],
        "boxes": out["box"],
        "any_active": out["any_active"],
        "region_pct": out["region_pct"],
        "mem_gray": mem_gray,
        "w_final": w_final,
    }
    if return_flow:
        res["flow"] = out["flow"]
    return res


def stream_masks_from_events(
    x,
    y,
    p,
    t_us,
    frames_gray: Array,
    frame_t_us,
    cfg: PipelineConfig,
    event_hw: tuple[int, int],
    slice_us: int = 1000,
    event_cfg=None,
    warp_radius: int | None = None,
    kernel_mode: str = "auto",
) -> dict[str, Array]:
    """Hybrid neuromorphic serving: an event stream drives the device
    state; a synchronised frame stream provides intensity for the
    ROI-gated flow.

    This closes the loop the reference leaves open — its event simulator
    (eventsim/event_mem_sim.py) produces state maps but is never wired to
    the flow pipelines (which replay MATLAB-produced ``.mat`` state).
    Here the events between consecutive frame timestamps are integrated
    with the event-driven device model (V1/V2 schemes, refractory —
    :func:`nsof_tpu.device.event_sim.simulate_events`), the state after
    each interval becomes that frame pair's gating map (``memimg2``
    semantics), and all pairs then run the batched throughput path.

    Args:
        x, y, p, t_us: the event stream (same convention as ``bin_events``).
        frames_gray: [T, H, W] uint8 frames, T ≥ 2.
        frame_t_us: [T] int frame timestamps (µs, same clock as ``t_us``);
            intervals need not be uniform, but uniform intervals (and
            ``slice_us`` dividing them) reuse one compiled program.
        cfg: pipeline preset; ``cfg.roi.memsize`` must map the event grid
            onto the image (image_h == event_hw[0] * memsize).
        event_hw: (gh, gw) device/event-array resolution.
        event_cfg: :class:`nsof_tpu.device.event_sim.EventSimConfig`
            (default V1 boxcar, magnitude polarity — one state array).

    Gate map: the event-driven device keeps ``w`` near ``w_init`` (0.5)
    where quiet, so the reference's conductance→uint8 transform saturates
    at 255 across the whole usable range — it was calibrated for the
    MATLAB ``.mat`` conductances, not this scheme.  The gate here is the
    *state displacement* ``u8(|w − w_init| · 255)``: polarity-agnostic
    (V1's upward drive and V2's downward drive both register) and
    physically "how far each synapse has moved".  ``cfg.roi.thres`` is
    therefore in displacement counts (e.g. 58 ≈ |Δw| 0.23).

    Returns the :func:`stream_masks` dict (masks/boxes/any_active/
    region_pct), ``mem_gate`` (the displacement maps actually gated on)
    and ``state`` (the event-sim carry for continuing the stream).
    """
    import numpy as np

    from nsof_tpu.device.event_sim import (
        EventSimConfig,
        bin_events,
        simulate_events,
    )

    if event_cfg is None:
        event_cfg = EventSimConfig(version=1, polarity="magnitude")
    gh, gw = event_hw
    frames_gray = jnp.asarray(frames_gray)
    frame_t_us = np.asarray(frame_t_us, np.int64)
    n_pairs = frames_gray.shape[0] - 1
    assert frame_t_us.shape[0] == frames_gray.shape[0]

    x = np.asarray(x)
    y = np.asarray(y)
    p = np.asarray(p)
    t_us = np.asarray(t_us, np.int64)

    t0 = frame_t_us[0]
    carry = None
    mem_gray = []
    for i in range(n_pairs):
        lo, hi = int(frame_t_us[i]), int(frame_t_us[i + 1])
        sel = (t_us >= lo) & (t_us < hi)
        n_slices = max(1, -(-(hi - lo) // slice_us))
        binned = bin_events(
            x[sel], y[sel], p[sel], t_us[sel], slice_us, gh, gw,
            t_origin=lo, n_slices=n_slices,
        )
        out = simulate_events(
            binned, event_cfg, initial_state=carry,
            time_offset=int(lo - t0),
        )
        carry = out["state"]
        disp = jnp.abs(out["w_final"] - event_cfg.params.w_init) * 255.0
        mem_gray.append(jnp.clip(disp, 0, 255).astype(jnp.uint8))
    gate = jnp.stack(mem_gray)

    seg = seg_batch_fast(
        gate,
        frames_gray[:-1],
        frames_gray[1:],
        cfg,
        warp_radius,
        kernel_mode,
    )
    return {
        "masks": seg["mask"],
        "boxes": seg["box"],
        "any_active": seg["any_active"],
        "region_pct": seg["region_pct"],
        "mem_gate": gate,
        "state": carry,
    }


def stream_masks_chunked(
    frames_gray: Array,
    cfg: PipelineConfig,
    sim: FrameSimConfig = FrameSimConfig(),
    chunk_pairs: int = 64,
    warp_radius: int | None = None,
    kernel_mode: str = "auto",
) -> dict[str, Array]:
    """Chunked driver for unbounded streams in bounded device memory.

    Processes ``chunk_pairs`` frame pairs per compiled call, carrying
    ``(w_final, last frame)`` across chunks — the same state-threading the
    event simulator's chunked driver uses
    (:func:`nsof_tpu.device.event_sim.simulate_events_stream`).  All
    chunks share one executable (fixed chunk shape; the tail chunk pads
    by repeating its last frame and trims the outputs), so results are
    bit-equal to the one-shot :func:`stream_masks` (tested).
    """
    import numpy as np

    frames_gray = np.asarray(frames_gray)
    t = frames_gray.shape[0]
    n_pairs = t - 1
    w_carry = None
    masks, boxes, active, pct, mem = [], [], [], [], []
    for s in range(0, n_pairs, chunk_pairs):
        e = min(s + chunk_pairs, n_pairs)
        chunk = frames_gray[s : e + 1]
        pad = chunk_pairs - (e - s)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        out = stream_masks(
            jnp.asarray(chunk), cfg, sim, w_carry, warp_radius, kernel_mode
        )
        k = e - s
        masks.append(np.asarray(out["masks"][:k]))
        boxes.append(np.asarray(out["boxes"][:k]))
        active.append(np.asarray(out["any_active"][:k]))
        pct.append(np.asarray(out["region_pct"][:k]))
        mem.append(np.asarray(out["mem_gray"][:k]))
        # the tail pad repeats the last frame: |Δ|=0 drives v=0, but the
        # state still relaxes under integration — recompute the carry from
        # the true (unpadded) pair count by scanning only k pairs
        if pad:
            comp = compress_frames(
                jnp.asarray(chunk[: k + 1], jnp.float32) / 255.0,
                sim.m,
                sim.n,
            )
            w0 = (
                w_carry
                if w_carry is not None
                else jnp.full(comp.shape[1:], sim.params.w_init, jnp.float32)
            )
            w_carry, _ = _scan_device_maps(comp, sim, w0)
        else:
            w_carry = out["w_final"]
    return {
        "masks": np.concatenate(masks),
        "boxes": np.concatenate(boxes),
        "any_active": np.concatenate(active),
        "region_pct": np.concatenate(pct),
        "mem_gray": np.concatenate(mem),
        "w_final": w_carry,
    }
