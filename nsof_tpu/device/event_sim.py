"""Event-driven memristor-array simulator.

TPU-native re-design of ``eventsim/event_mem_sim.py``.  The reference iterates
time slices in Python, doing numpy work per slice (:164-328).  Here the stream
is binned once into dense per-slice tensors (a cheap O(n_events) host pass,
the data layer), and the whole simulation — voltage-map construction,
refractory gating, state integration, resistance snapshots — runs as a single
``jax.lax.scan`` on device.

Two schemes, matching the reference:

- **V1 boxcar** (:207-227): pixels with ≥ ``theta_events`` events in a window
  receive ``active_v``, others ``silent_v``; one state update per window.
- **V2 DC-bias + overlay** (:230-286): constant ``silent_v`` bias plus
  per-event ``active_v`` overlays with a per-pixel refractory period;
  ``polarity='split'`` drives two independent arrays (ON events → array A,
  OFF events with p==0 → array B), ``polarity='magnitude'`` drives one.

Refractory semantics follow the reference exactly: a pixel's overlay in a
slice is allowed iff ``next_ok[pixel] <= t_first`` where ``t_first`` is the
timestamp of the *first event in the slice* (global, not per pixel, :243),
and accepted pixels set ``next_ok = t_last + refractory_us`` where ``t_last``
is the last event timestamp in the slice (:247).  Duplicate events on one
pixel within a slice apply the overlay once (numpy fancy-index store
semantics, :246).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nsof_tpu.device.model import (
    DEFAULT_PARAMS,
    DT,
    DeviceParams,
    resistance_exp,
    update_state,
)

Array = jnp.ndarray


@dataclasses.dataclass
class BinnedEvents:
    """Dense per-slice event tensors (time rebased to the first event).

    Produced by :func:`bin_events`.  All arrays have leading dim ``T`` =
    number of slices.  Timestamps are int32 microseconds relative to the
    first event (rebasdng keeps int32 safe for ~35 min streams without
    requiring x64 mode).
    """

    counts: np.ndarray  # [T, H, W] uint8 event counts (clipped at 255)
    on_any: np.ndarray  # [T, H, W] bool, any event with p == 1
    off_any: np.ndarray  # [T, H, W] bool, any event with p == 0
    any_ev: np.ndarray  # [T, H, W] bool, any event at all
    t_first: np.ndarray  # [T] int32, ts of first event in slice (0 if empty)
    t_last: np.ndarray  # [T] int32, ts of last event in slice (0 if empty)
    valid: np.ndarray  # [T] bool, slice contains real data (not padding)
    height: int = 0
    width: int = 0
    slice_us: int = 1000


def bin_events(
    x: np.ndarray,
    y: np.ndarray,
    p: np.ndarray,
    t_us: np.ndarray,
    slice_us: int = 1000,
    height: Optional[int] = None,
    width: Optional[int] = None,
    use_native: bool = True,
    t_origin: Optional[int] = None,
    n_slices: Optional[int] = None,
) -> BinnedEvents:
    """Bin an event stream into fixed-duration windows.

    Window boundaries replicate the reference's ``slice_indices``
    (eventsim/event_mem_sim.py:78-83): ``arange(t[0], t[-1]+slice_us,
    slice_us)`` with ``searchsorted`` — so the final partial window is kept.
    ``height``/``width`` default to ``max+1`` as in ``load_events`` (:69-75).

    ``t_origin``/``n_slices`` override the window anchor and count (used by
    the chunked long-stream driver to keep window phase continuous across
    chunks); by default the anchor is the first event timestamp.

    Uses the single-pass C++ binner (nsof_tpu.native) when available;
    falls back to the numpy implementation transparently.
    """
    x = np.asarray(x)
    y = np.asarray(y)
    p = np.asarray(p).astype(np.int64)
    t_us = np.asarray(t_us).astype(np.int64)
    if height is None:
        height = int(y.max()) + 1 if y.size else 1
    if width is None:
        width = int(x.max()) + 1 if x.size else 1
    h, w = height, width

    if use_native and t_us.size and t_origin is None and n_slices is None:
        from nsof_tpu.native import bin_events_native

        nat = bin_events_native(x, y, p, t_us, slice_us, h, w)
        if nat is not None:
            return BinnedEvents(
                counts=nat["counts"],
                on_any=nat["on_any"],
                off_any=nat["off_any"],
                any_ev=nat["counts"] > 0,
                t_first=nat["t_first"],
                t_last=nat["t_last"],
                valid=np.ones(nat["nt"], bool),
                height=h,
                width=w,
                slice_us=slice_us,
            )

    if t_us.size == 0:
        nt0 = n_slices or 0
        z = np.zeros((nt0, h, w), np.uint8)
        zb = np.zeros((nt0, h, w), bool)
        zt = np.zeros((nt0,), np.int32)
        return BinnedEvents(z, zb, zb, zb, zt, zt,
                            np.ones(nt0, bool), h, w, slice_us)

    t0 = t_us[0] if t_origin is None else int(t_origin)
    t_rel = (t_us - t0).astype(np.int64)
    if n_slices is None:
        bounds = np.arange(0, t_rel[-1] + slice_us, slice_us, dtype=np.int64)
    else:
        bounds = np.arange(
            0, (n_slices + 1) * slice_us, slice_us, dtype=np.int64
        )
    idx = np.searchsorted(t_rel, bounds)
    nt = len(idx) - 1
    if nt <= 0:
        z = np.zeros((0, h, w), np.uint8)
        zb = np.zeros((0, h, w), bool)
        zt = np.zeros((0,), np.int32)
        return BinnedEvents(z, zb, zb, zb, zt, zt, zt.astype(bool), h, w, slice_us)

    # slice id per event: event i belongs to slice j iff idx[j] <= i < idx[j+1];
    # events at/after the final boundary are dropped, exactly as the
    # reference's slice generator never yields them (event_mem_sim.py:78-83)
    sl_of_ev = np.searchsorted(idx, np.arange(t_rel.size), side="right") - 1
    keep = (sl_of_ev >= 0) & (sl_of_ev < nt)
    sl_of_ev, x, y, p = sl_of_ev[keep], x[keep], y[keep], p[keep]

    lin = sl_of_ev * (h * w) + y.astype(np.int64) * w + x.astype(np.int64)
    counts = np.bincount(lin, minlength=nt * h * w).reshape(nt, h, w)
    on = np.bincount(lin[p == 1], minlength=nt * h * w).reshape(nt, h, w) > 0
    off = np.bincount(lin[p == 0], minlength=nt * h * w).reshape(nt, h, w) > 0

    t_first = np.zeros(nt, np.int64)
    t_last = np.zeros(nt, np.int64)
    has = idx[1:] > idx[:-1]
    t_first[has] = t_rel[idx[:-1][has]]
    t_last[has] = t_rel[idx[1:][has] - 1]

    return BinnedEvents(
        counts=np.minimum(counts, 255).astype(np.uint8),
        on_any=on,
        off_any=off,
        any_ev=counts > 0,
        t_first=t_first.astype(np.int32),
        t_last=t_last.astype(np.int32),
        valid=np.ones(nt, bool),
        height=h,
        width=w,
        slice_us=slice_us,
    )


@dataclasses.dataclass(frozen=True)
class EventSimConfig:
    """Knobs of the event simulator (CLI defaults, event_mem_sim.py:334-352).

    Frozen/hashable: it is a static jit argument of the simulation core.
    """

    version: int = 1
    active_v: float = -6.0
    silent_v: float = 0.0
    polarity: str = "split"  # 'split' | 'magnitude' (version 2 only)
    theta_events: int = 1
    refractory_us: int = 800
    dt: float = DT
    params: DeviceParams = DEFAULT_PARAMS
    n_snapshots: int = 100  # aim for ~this many resistance snapshots


def _snapshot_group_scan(step_fn, carry0, inputs, t, group):
    """Scan over ``ceil(t/group)`` groups of ``group`` steps, emitting one
    resistance snapshot per group (after the group's first step) — the
    reference's ``slice_counter % save_every_n == 0`` decimation
    (event_mem_sim.py:185,277-284) without materialising every frame.
    """
    n_groups = -(-t // group)
    pad = n_groups * group - t

    def pad_axis(a):
        cfg = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg)

    inputs = jax.tree.map(pad_axis, inputs)
    inputs = jax.tree.map(
        lambda a: a.reshape((n_groups, group) + a.shape[1:]), inputs
    )

    def group_step(carry, group_inputs):
        first = jax.tree.map(lambda a: a[0], group_inputs)
        carry, snap = step_fn(carry, first, True)

        def inner(i, c):
            rest = jax.tree.map(lambda a: a[i], group_inputs)
            c, _ = step_fn(c, rest, False)
            return c

        carry = jax.lax.fori_loop(1, group, inner, carry)
        return carry, snap

    return jax.lax.scan(group_step, carry0, inputs)


def simulate_events(
    binned: BinnedEvents,
    cfg: EventSimConfig = EventSimConfig(),
    initial_state: Optional[dict] = None,
    time_offset: int = 0,
) -> dict[str, Array]:
    """Run the event-driven device simulation on device.

    Returns a dict with ``w_final`` [H, W]; ``resistances`` [S, H, W]
    decimated snapshots; ``state`` (carry for chunked continuation, see
    :func:`simulate_events_stream`); and, for version 2 'split',
    ``w_final_b`` / ``resistances_b`` for the OFF-event array (the
    reference's ``*.V2_b`` outputs, event_mem_sim.py:293-303).  For
    'magnitude' the ``_b`` entries are empty arrays, matching the
    reference's placeholder npz.

    ``initial_state`` resumes from a prior chunk's ``state``;
    ``time_offset`` is added to the binned per-slice timestamps so the
    refractory clocks stay in global stream time across chunks.
    """
    assert cfg.version in (1, 2)
    assert cfg.polarity in ("split", "magnitude")
    p = cfg.params
    h, w = binned.height, binned.width
    t = binned.counts.shape[0]
    n_arrays_all = 2 if (cfg.version == 2 and cfg.polarity == "split") else 1
    if initial_state is None:
        w0_single = jnp.full((h, w), p.w_init, jnp.float32)
        state0 = {
            "w": (w0_single,) * n_arrays_all,
            "next_ok": (jnp.zeros((h, w), jnp.int32),) * n_arrays_all,
        }
    else:
        state0 = initial_state
    if t == 0:
        empty = jnp.zeros((0, h, w), jnp.float32)
        return {"w_final": state0["w"][0], "resistances": empty,
                "w_final_b": jnp.zeros((0,)),
                "resistances_b": jnp.zeros((0,)), "state": state0}
    if cfg.version == 1:
        pack = {"counts": binned.counts, "valid": binned.valid}
    else:
        masks = (
            (binned.on_any, binned.off_any)
            if cfg.polarity == "split"
            else (binned.any_ev,)
        )
        pack = {"masks": masks, "t_first": binned.t_first,
                "t_last": binned.t_last, "valid": binned.valid}
    return _simulate_events_traced(
        pack, state0, jnp.int32(time_offset), cfg=cfg
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _simulate_events_traced(pack, state0, time_offset, cfg: EventSimConfig):
    """Whole-simulation core as ONE jitted program.

    Outside jit every surrounding op dispatches eagerly — ~30 ms each over
    the remote-TPU tunnel, ~1.3 s per 1000-slice run; as a single program
    the same simulation executes in ~35 ms (scripts/bench_event_sim.py).
    ``time_offset`` is traced so chunked streaming reuses one compilation.
    """
    p = cfg.params
    valid = pack["valid"]
    t = valid.shape[0]
    group = max(1, t // cfg.n_snapshots)

    if cfg.version == 1:
        active = pack["counts"] >= cfg.theta_events
        inputs = {"active": active, "valid": valid}

        def step(w_st, inp, want_snap):
            v = jnp.where(inp["active"], cfg.active_v, cfg.silent_v)
            w_new = update_state(w_st, v, p, cfg.dt)
            w_new = jnp.where(inp["valid"], w_new, w_st)
            snap = resistance_exp(w_new, p) if want_snap else None
            return w_new, snap

        w_final, res = _snapshot_group_scan(
            step, state0["w"][0], inputs, t, group
        )
        return {
            "w_final": w_final,
            "resistances": res,
            "w_final_b": jnp.zeros((0,), jnp.float32),
            "resistances_b": jnp.zeros((0,), jnp.float32),
            "state": {"w": (w_final,), "next_ok": state0["next_ok"]},
        }

    # ── version 2 ─────────────────────────────────────────────────────────
    split = cfg.polarity == "split"
    t_first = pack["t_first"] + time_offset
    t_last = pack["t_last"] + time_offset
    masks = pack["masks"]

    inputs = {
        "masks": masks,
        "t_first": t_first,
        "t_last": t_last,
        "valid": valid,
    }
    n_arrays = len(masks)
    carry0 = state0

    def step(carry, inp, want_snap):
        new_w, new_next, snaps = [], [], []
        for i in range(n_arrays):
            mask = inp["masks"][i]
            ok = mask & (carry["next_ok"][i] <= inp["t_first"])
            v = jnp.where(ok, cfg.silent_v + cfg.active_v, cfg.silent_v)
            w_new = update_state(carry["w"][i], v, p, cfg.dt)
            nxt = jnp.where(ok, inp["t_last"] + cfg.refractory_us,
                            carry["next_ok"][i])
            w_new = jnp.where(inp["valid"], w_new, carry["w"][i])
            nxt = jnp.where(inp["valid"], nxt, carry["next_ok"][i])
            new_w.append(w_new)
            new_next.append(nxt)
            if want_snap:
                snaps.append(resistance_exp(w_new, p))
        carry = {"w": tuple(new_w), "next_ok": tuple(new_next)}
        return carry, tuple(snaps) if want_snap else None

    carry, snaps = _snapshot_group_scan(step, carry0, inputs, t, group)
    out = {"w_final": carry["w"][0], "resistances": snaps[0],
           "state": carry}
    if split:
        out["w_final_b"] = carry["w"][1]
        out["resistances_b"] = snaps[1]
    else:
        out["w_final_b"] = jnp.zeros((0,), jnp.float32)
        out["resistances_b"] = jnp.zeros((0,), jnp.float32)
    return out


def simulate_events_stream(
    x: np.ndarray,
    y: np.ndarray,
    p: np.ndarray,
    t_us: np.ndarray,
    slice_us: int = 1000,
    cfg: EventSimConfig = EventSimConfig(),
    chunk_slices: int = 4096,
    height: Optional[int] = None,
    width: Optional[int] = None,
) -> dict[str, Array]:
    """Chunked long-stream simulation: bins and scans ``chunk_slices``
    windows at a time, carrying device state (w arrays + refractory
    timestamps) across chunks — memory stays bounded regardless of stream
    length (the reference's decimated-snapshot strategy for hours-long
    recordings, with the binned tensors never fully materialised).

    Returns the same dict as :func:`simulate_events` with snapshots
    concatenated across chunks.
    """
    import jax

    if height is None:
        height = int(np.asarray(y).max()) + 1 if len(y) else 1
    if width is None:
        width = int(np.asarray(x).max()) + 1 if len(x) else 1
    t_us = np.asarray(t_us).astype(np.int64)
    if t_us.size == 0:
        return simulate_events(
            bin_events(x, y, p, t_us, slice_us, height, width), cfg
        )
    t0 = t_us[0]
    span = chunk_slices * slice_us
    n_chunks = int((t_us[-1] - t0) // span) + 1

    carry = None
    res_chunks = []
    res_b_chunks = []
    final = None
    x = np.asarray(x)
    y = np.asarray(y)
    p = np.asarray(p)
    for ci in range(n_chunks):
        lo = int(t0 + ci * span)
        hi = lo + span
        sel = (t_us >= lo) & (t_us < hi)
        # window phase stays continuous across chunks: anchor every chunk
        # at its own start and bin exactly chunk_slices windows
        binned = bin_events(
            x[sel], y[sel], p[sel], t_us[sel], slice_us, height, width,
            t_origin=lo, n_slices=chunk_slices,
        )
        out = simulate_events(binned, cfg, initial_state=carry,
                              time_offset=ci * span)
        carry = out["state"]
        res_chunks.append(np.asarray(out["resistances"]))
        if cfg.version == 2 and cfg.polarity == "split":
            res_b_chunks.append(np.asarray(out["resistances_b"]))
        final = out
    result = {
        "w_final": final["w_final"],
        "resistances": np.concatenate(res_chunks, axis=0)
        if res_chunks
        else np.zeros((0, height, width), np.float32),
        "w_final_b": final["w_final_b"],
        "resistances_b": (
            np.concatenate(res_b_chunks, axis=0)
            if res_b_chunks
            else final["resistances_b"]
        ),
    }
    return result


def simulate_events_reference(
    binned: BinnedEvents, cfg: EventSimConfig = EventSimConfig()
) -> dict[str, np.ndarray]:
    """Pure-numpy oracle with the same slice semantics, for tests."""
    p = cfg.params
    h, w = binned.height, binned.width
    t = binned.counts.shape[0]
    group = max(1, t // cfg.n_snapshots)
    w_a = np.full((h, w), p.w_init, np.float32)
    res = []
    if cfg.version == 1:
        for i in range(t):
            v = np.where(binned.counts[i] >= cfg.theta_events,
                         cfg.active_v, cfg.silent_v).astype(np.float32)
            w_a = np.asarray(update_state(w_a, v, p, cfg.dt))
            if i % group == 0:
                res.append(np.asarray(resistance_exp(w_a, p)))
        return {"w_final": w_a, "resistances": np.stack(res)}

    split = cfg.polarity == "split"
    arrays = [w_a.copy() for _ in range(2 if split else 1)]
    next_ok = [np.zeros((h, w), np.int64) for _ in range(len(arrays))]
    hist: list[list[np.ndarray]] = [[] for _ in range(len(arrays))]
    mask_seq = (
        [binned.on_any, binned.off_any] if split else [binned.any_ev]
    )
    for i in range(t):
        for k in range(len(arrays)):
            ok = mask_seq[k][i] & (next_ok[k] <= binned.t_first[i])
            v = np.where(ok, cfg.silent_v + cfg.active_v, cfg.silent_v)
            arrays[k] = np.asarray(
                update_state(arrays[k], v.astype(np.float32), p, cfg.dt))
            next_ok[k][ok] = binned.t_last[i] + cfg.refractory_us
            if i % group == 0:
                hist[k].append(np.asarray(resistance_exp(arrays[k], p)))
    out = {"w_final": arrays[0], "resistances": np.stack(hist[0])}
    if split:
        out["w_final_b"] = arrays[1]
        out["resistances_b"] = np.stack(hist[1])
    return out
