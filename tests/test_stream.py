"""Streaming pipeline tests: device-state scan → batched ROI-gated masks.

Covers nsof_tpu/pipelines/stream.py — the single-program composition of
the frame-driven device simulator (reference: MATLAB simulation phase)
with the batched throughput segmentation path (reference: per-pair host
loop in optical_flow_seg.py), plus the chunked driver's state threading.
"""

import dataclasses

import numpy as np
import pytest

from nsof_tpu.config import PipelineConfig
from nsof_tpu.device.frame_sim import FrameSimConfig
from nsof_tpu.ops.roi import RoiConfig
from nsof_tpu.pipelines.stream import stream_masks, stream_masks_chunked

H = W = 160
BOX = 40
SPEED = 3  # px/frame; within the fast path's default warp radius


def _moving_box_frames(t=14):
    """Bright box sweeping right over a dark background."""
    frames = np.full((t, H, W), 20, np.uint8)
    y0 = 60
    for i in range(t):
        x0 = 8 + SPEED * i
        frames[i, y0 : y0 + BOX, x0 : x0 + BOX] = 220
    return frames


def _sim():
    # 20 px/cell -> 8x8 grid; default device constants
    return FrameSimConfig(m=20, n=20)


def _cfg(thres):
    return PipelineConfig(
        name="stream-test",
        image_h=H,
        image_w=W,
        roi=RoiConfig(memsize=20, thres=thres, mode=2),
    )


@pytest.fixture(scope="module")
def stream_out():
    import jax.numpy as jnp

    from nsof_tpu.device.frame_sim import compress_frames
    from nsof_tpu.pipelines.stream import _scan_device_maps

    frames = _moving_box_frames()
    sim = _sim()
    # Derive the activity threshold from the device maps alone (cheap
    # compile) so the full pipeline below compiles exactly once.
    comp = compress_frames(
        jnp.asarray(frames, jnp.float32) / 255.0, sim.m, sim.n
    )
    w0 = jnp.full(comp.shape[1:], sim.params.w_init, jnp.float32)
    _, mem = _scan_device_maps(comp, sim, w0)
    mem = np.asarray(mem)
    return frames, sim, mem


def _thres(mem):
    return int((int(mem[-1, 3:5, 1:4].min()) + int(mem[-1, 0, 7])) // 2)


def test_device_maps_separate_motion_from_background(stream_out):
    frames, sim, mem = stream_out
    # cells the box crossed vs the far corner cell
    moving = mem[-1, 3:5, 1:4]
    still = mem[-1, 0, 7]
    assert moving.min() > int(still) + 5, (
        f"device map does not separate motion: moving {moving.min()} "
        f"vs still {still}"
    )


def test_stream_masks_track_the_moving_box(stream_out):
    frames, sim, mem = stream_out
    out = stream_masks(frames, _cfg(_thres(mem)), sim)
    masks = np.asarray(out["masks"])
    assert masks.shape == (len(frames) - 1, H, W)
    assert masks.dtype == np.uint8
    active = np.asarray(out["any_active"])
    assert active[3:].all(), "ROI should be active once the state charges"
    # the merged ROI box must overlap the box's true position on the
    # last pair
    x0, y0, x1, y1 = np.asarray(out["boxes"][-1])
    bx0 = 8 + SPEED * (len(frames) - 1)
    assert x1 > bx0 and x0 < bx0 + BOX
    assert y1 > 60 and y0 < 60 + BOX
    # the segmentation mask marks motion inside the ROI
    assert masks[-1].sum() > 0


@pytest.mark.slow
def test_chunked_equals_oneshot(stream_out):
    frames, sim, mem = stream_out
    cfg = _cfg(_thres(mem))
    one = stream_masks(frames, cfg, sim)
    # 13 pairs with chunk 5 -> chunks of 5/5/3, tail padded + carry
    # recomputed from true pairs
    chunked = stream_masks_chunked(frames, cfg, sim, chunk_pairs=5)
    np.testing.assert_array_equal(
        chunked["masks"], np.asarray(one["masks"])
    )
    np.testing.assert_array_equal(
        chunked["mem_gray"], np.asarray(one["mem_gray"])
    )
    np.testing.assert_array_equal(
        chunked["boxes"], np.asarray(one["boxes"])
    )
    np.testing.assert_allclose(
        np.asarray(chunked["w_final"]),
        np.asarray(one["w_final"]),
        rtol=0,
        atol=1e-6,
    )


@pytest.mark.slow
def test_stream_flow_recovers_true_velocity():
    """End-to-end physics: frames → device scan → ROI → Farnebäck flow
    must measure the object's TRUE velocity, through the whole stack.

    A textured box (so flow is well-defined over its interior, not just
    its edges) translates at exactly SPEED px/frame; the scattered flow
    (negated Farnebäck convention, optical_flow_seg.py:461) inside the
    eroded box must be ≈ (−SPEED, 0) once the device state has charged.
    """
    rng = np.random.default_rng(11)
    tex = (rng.random((BOX, BOX)) * 180 + 40).astype(np.uint8)
    t = 14
    frames = np.full((t, H, W), 20, np.uint8)
    y0 = 60
    for i in range(t):
        x0 = 8 + SPEED * i
        frames[i, y0 : y0 + BOX, x0 : x0 + BOX] = tex

    import jax.numpy as jnp

    from nsof_tpu.device.frame_sim import compress_frames
    from nsof_tpu.pipelines.stream import _scan_device_maps

    sim = _sim()
    comp = compress_frames(
        jnp.asarray(frames, jnp.float32) / 255.0, sim.m, sim.n
    )
    w0 = jnp.full(comp.shape[1:], sim.params.w_init, jnp.float32)
    _, mem = _scan_device_maps(comp, sim, w0)
    out = stream_masks(
        frames, _cfg(_thres(np.asarray(mem))), sim, return_flow=True
    )
    flow = np.asarray(out["flow"])
    assert flow.shape == (t - 1, H, W, 2)
    active = np.asarray(out["any_active"])
    assert active[3:].all()
    for i in range(4, t - 1):
        x0 = 8 + SPEED * (i + 1)  # box position in the NEXT frame
        # interior sample well clear of both frames' box borders
        inner = flow[i, y0 + 12 : y0 + BOX - 12, x0 : x0 + BOX - 12 - SPEED]
        med_dx = float(np.median(inner[..., 0]))
        med_dy = float(np.median(inner[..., 1]))
        assert abs(med_dx - (-SPEED)) < 0.5, (i, med_dx)
        assert abs(med_dy) < 0.5, (i, med_dy)


def test_event_gated_stream():
    """Hybrid path: synthetic event stream gates flow on matching frames.

    Events live on a 16x16 device grid (memsize 10 -> 160x160 frames);
    the chained per-interval device state must equal one un-chunked
    simulate_events run, and the ROI must land on the moving box.
    """
    import jax.numpy as jnp

    from nsof_tpu.device.event_sim import (
        EventSimConfig,
        bin_events,
        simulate_events,
    )
    from nsof_tpu.device.synthetic import generate_synthetic_events
    from nsof_tpu.pipelines.stream import stream_masks_from_events

    gh = gw = 16
    x, y, p, t = generate_synthetic_events(
        height=gh, width=gw, box_h=4, box_w=4, speed_pps=16, duration_s=1.0
    )
    n_frames = 11
    frame_t = np.arange(n_frames, dtype=np.int64) * 100_000  # 10 fps, 1 s
    frames = np.full((n_frames, H, W), 20, np.uint8)
    for i in range(n_frames):
        gx0 = int(frame_t[i] / 1e6 * 16)
        frames[i, 60:100, gx0 * 10 : (gx0 + 4) * 10] = 220

    ecfg = EventSimConfig(version=1, polarity="magnitude")
    # gate is |w - w_init|*255; the V1 drive moves crossed cells by
    # ~0.1-0.23 in state -> displacement counts ~25-58
    out = stream_masks_from_events(
        x, y, p, t, frames, frame_t,
        _cfg(thres=20), (gh, gw), slice_us=1000, event_cfg=ecfg,
    )
    masks = np.asarray(out["masks"])
    assert masks.shape == (n_frames - 1, H, W)

    # chained interval state == one-shot event simulation state
    sel = t < frame_t[-1]
    binned = bin_events(
        x[sel], y[sel], p[sel], t[sel], 1000, gh, gw,
        t_origin=0, n_slices=1000,
    )
    one = simulate_events(binned, ecfg)
    np.testing.assert_allclose(
        np.asarray(out["state"]["w"][0]),
        np.asarray(one["w_final"]),
        atol=1e-6,
        rtol=0,
    )

    # the event-driven gate actually fires and the ROI tracks the box
    active = np.asarray(out["any_active"])
    assert active.any(), "event-driven gate never fired"
    last = int(np.nonzero(active)[0][-1])
    x0, y0, x1, y1 = np.asarray(out["boxes"][last])
    gx0 = int(frame_t[last + 1] / 1e6 * 16) * 10
    assert x1 > gx0 - 20 and x0 < gx0 + 60
    assert y1 > 40 and y0 < 120


def test_w0_continuation_matches_split_scan(stream_out):
    """Feeding chunk 2 the carry of chunk 1 continues the stream exactly.

    Uses the device-map scan directly (the carry semantics live there);
    the full-pipeline equivalence is test_chunked_equals_oneshot.
    """
    import jax.numpy as jnp

    from nsof_tpu.device.frame_sim import compress_frames
    from nsof_tpu.pipelines.stream import _scan_device_maps

    frames, sim, mem = stream_out
    comp = compress_frames(
        jnp.asarray(frames, jnp.float32) / 255.0, sim.m, sim.n
    )
    w0 = jnp.full(comp.shape[1:], sim.params.w_init, jnp.float32)
    wa, ma = _scan_device_maps(comp[:8], sim, w0)
    _, mb = _scan_device_maps(comp[7:], sim, wa)
    got = np.concatenate([np.asarray(ma), np.asarray(mb)])
    np.testing.assert_array_equal(got, mem)
