"""Neuromorphic ROI extraction — the core IP of the reference, on device.

Reproduces the per-pipeline ROI chain (duplicated in every reference script,
implemented once here): threshold the device-state map
(``update_transition_pic``, optical_flow_seg.py:115-121), find connected
active regions (``cv2.connectedComponentsWithStats``, :223), and derive
either per-component boxes (FLAG=1, ``process_separate_regions``, :123-166)
or one merged union box (FLAG=2, ``process_merged_region``, :168-209), scaled
to image coordinates by the device cell size and padded by the EXTEND
margins.

The idiomatic-TPU departure from the reference: crops are *not* dynamically
sized.  :func:`crop_window` extracts a fixed-size window with
``lax.dynamic_slice`` (static shape per dataset preset) and
:func:`scatter_window` writes results back only inside the true ROI box —
giving XLA static shapes while preserving the reference's
scatter-into-zeros semantics (optical_flow_seg.py:159).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nsof_tpu.ops.components import connected_components_with_stats

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class RoiConfig:
    """Per-dataset ROI parameters (data/*/Parameters.txt)."""

    memsize: int = 80  # image px per device cell (MEMSIZE)
    thres: int = 250  # activity threshold on the uint8 state map (THRES)
    extend_left: int = 20  # EXTEND_WIDTH_LEFT
    extend_right: int = 20  # EXTEND_WIDTH_RIGHT
    extend_up: int = 20  # EXTEND_HEIGHT_UPPER
    extend_down: int = 20  # EXTEND_HEIGHT_LOWER
    connectivity: int = 4  # CONNECT
    mode: int = 2  # FLAG: 1 = separate regions, 2 = merged union box
    padding: int = 20  # PADDING applied by the task heads
    k_max: int = 16  # static slots for separate regions


def transition_map(mem_u8: Array, thres: int) -> Array:
    """Binary activity map: 255 where state ≥ thres (update_transition_pic
    parity; the numba loop becomes one fused compare)."""
    return jnp.where(jnp.asarray(mem_u8) >= thres, 255, 0).astype(jnp.uint8)


def _clamp_box(x0, y0, x1, y1, w, h):
    return (
        jnp.maximum(x0, 0),
        jnp.maximum(y0, 0),
        jnp.minimum(x1, w),
        jnp.minimum(y1, h),
    )


def roi_boxes(
    mem_u8: Array,
    image_h: int,
    image_w: int,
    cfg: RoiConfig,
) -> dict[str, Array]:
    """Threshold → connected components → image-space ROI boxes.

    Returns dict with
      ``boxes``  [k_max, 4] int32 (x_start, y_start, x_end, y_end), end
                 exclusive, already scaled by memsize and EXTEND-padded and
                 clamped to the image — per active component (FLAG=1 layout);
      ``valid``  [k_max] bool;
      ``merged`` [4] int32 union box with the same padding (FLAG=2);
      ``any_active`` scalar bool (False reproduces the reference's
                 no-region early exit, optical_flow_seg.py:227-234).
    """
    tp = transition_map(mem_u8, cfg.thres)
    cc = connected_components_with_stats(tp, cfg.connectivity, cfg.k_max)
    boxes_grid = cc["boxes"]  # (x, y, w, h) in grid cells
    valid = cc["valid"]

    px, py = cfg.memsize, cfg.memsize
    gx0 = boxes_grid[:, 0] * px - cfg.extend_left
    gy0 = boxes_grid[:, 1] * py - cfg.extend_up
    gx1 = (boxes_grid[:, 0] + boxes_grid[:, 2]) * px + cfg.extend_right
    gy1 = (boxes_grid[:, 1] + boxes_grid[:, 3]) * py + cfg.extend_down
    x0, y0, x1, y1 = _clamp_box(gx0, gy0, gx1, gy1, image_w, image_h)
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1)
    boxes = jnp.where(valid[:, None], boxes, 0)

    # Merged union box, then extend+clamp — matching process_merged_region
    # (optical_flow_seg.py:174-183), which pads the *union* of the raw
    # component boxes, not the union of padded boxes.  The union of all
    # component boxes equals the bbox of the active mask, so compute it
    # directly — exact even when components overflow the k_max slots.
    active = tp > 0
    gh, gw = active.shape
    big = jnp.int32(2**30)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    ux0 = jnp.min(jnp.where(active, col_ids, big))
    uy0 = jnp.min(jnp.where(active, row_ids, big))
    ux1 = jnp.max(jnp.where(active, col_ids + 1, -big))
    uy1 = jnp.max(jnp.where(active, row_ids + 1, -big))
    mx0, my0, mx1, my1 = _clamp_box(
        ux0 * px - cfg.extend_left,
        uy0 * py - cfg.extend_up,
        ux1 * px + cfg.extend_right,
        uy1 * py + cfg.extend_down,
        image_w,
        image_h,
    )
    any_active = jnp.any(valid)
    merged = jnp.where(
        any_active,
        jnp.stack([mx0, my0, mx1, my1]),
        jnp.zeros(4, jnp.int32),
    )
    return {
        "boxes": boxes.astype(jnp.int32),
        "valid": valid,
        "merged": merged.astype(jnp.int32),
        "any_active": any_active,
        "transition": tp,
        "labels": cc["labels"],
    }


def pad_box(box: Array, padding: int, image_h: int, image_w: int) -> Array:
    """The task heads' extra PADDING around the flow region
    (optical_flow_seg.py:273-277)."""
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    x0, y0, x1, y1 = _clamp_box(
        x0 - padding, y0 - padding, x1 + padding, y1 + padding, image_w, image_h
    )
    return jnp.stack([x0, y0, x1, y1])


def window_origin(box: Array, win_h: int, win_w: int, image_h: int, image_w: int):
    """Top-left of a fixed-size window containing ``box``, clamped in-image.

    If the box is larger than the window, the window covers its top-left
    portion (dataset presets size windows to the dataset's max ROI).
    """
    oy = jnp.clip(box[1], 0, max(image_h - win_h, 0))
    ox = jnp.clip(box[0], 0, max(image_w - win_w, 0))
    return oy.astype(jnp.int32), ox.astype(jnp.int32)


def crop_window(img: Array, origin_yx, win_h: int, win_w: int) -> Array:
    """Static-size window crop via ``lax.dynamic_slice`` ([H, W] or
    [H, W, C] input)."""
    oy, ox = origin_yx
    if img.ndim == 2:
        return jax.lax.dynamic_slice(img, (oy, ox), (win_h, win_w))
    return jax.lax.dynamic_slice(
        img, (oy, ox, 0), (win_h, win_w, img.shape[2])
    )


def crop_windows_batch(
    frames: Array, oys: Array, oxs: Array, win_h: int, win_w: int
) -> Array:
    """Batched static-size window crop: [B, H, W] frames + per-sample
    origins → [B, win_h, win_w].

    vmapped ``dynamic_slice`` lowers to per-element gathers on TPU; this
    uses a Pallas kernel whose per-sample DMA start offsets come from
    scalar-prefetched origin arrays — one contiguous copy per sample.
    Falls back to the vmap path off-TPU or for odd window sizes.

    Mosaic requires DMA offsets aligned to the uint8 tiling (32, 128), so
    origins are floor-rounded to those multiples and the ADJUSTED origins
    are returned — callers must scatter with them.  Size the window with
    ≥(32, 128) slack over the max ROI so rounding never clips the box.

    Returns (windows [B, win_h, win_w], oys_adj, oxs_adj).
    """
    b, h, w = frames.shape
    use_pallas = (
        jax.default_backend() == "tpu"
        and win_w % 128 == 0
        and win_h % 32 == 0
        and frames.dtype == jnp.uint8
    )
    if not use_pallas:
        return (
            jax.vmap(
                lambda img, oy, ox: crop_window(img, (oy, ox), win_h, win_w)
            )(frames, oys, oxs),
            oys,
            oxs,
        )
    oys = (oys // 32) * 32
    oxs = (oxs // 128) * 128

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(oy_ref, ox_ref, frames_ref, out_ref, sem):
        i = pl.program_id(0)
        oy = pl.multiple_of(oy_ref[i], 32)
        ox = pl.multiple_of(ox_ref[i], 128)
        copy = pltpu.make_async_copy(
            frames_ref.at[
                i,
                pl.ds(oy, win_h),
                pl.ds(ox, win_w),
            ],
            out_ref.at[0],
            sem,
        )
        copy.start()
        copy.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, win_h, win_w), lambda i, oy, ox: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    wins = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, win_h, win_w), frames.dtype),
    )(oys.astype(jnp.int32), oxs.astype(jnp.int32), frames)
    return wins, oys, oxs


def _window_onehots(
    oys: Array, oxs: Array, win_h: int, win_w: int,
    image_h: int, image_w: int,
):
    """Per-sample one-hot window selectors: Py [B, win_h, H] with
    ``Py[b, i, oys[b]+i] = 1`` and Px [B, win_w, W] likewise.

    Row/col selection as 0/1 matrices turns batched window crop/scatter
    into MXU matmuls — the gather/scatter-free formulation (vmapped
    ``dynamic_slice``/``dynamic_update_slice`` with per-sample offsets
    lower to per-element gathers/scatters on TPU; same trick as the
    hat-selector corr lookup in models/raft.py::corr_lookup)."""
    iy = jnp.arange(win_h, dtype=jnp.int32)
    ix = jnp.arange(win_w, dtype=jnp.int32)
    py = (
        oys[:, None, None] + iy[None, :, None]
        == jnp.arange(image_h, dtype=jnp.int32)[None, None, :]
    )
    px = (
        oxs[:, None, None] + ix[None, :, None]
        == jnp.arange(image_w, dtype=jnp.int32)[None, None, :]
    )
    return py.astype(jnp.float32), px.astype(jnp.float32)


def onehot_crop_batch(
    frames: Array, oys: Array, oxs: Array, win_h: int, win_w: int
) -> Array:
    """Batched static-size window crop via one-hot matmuls: [B, H, W(, C)]
    frames + per-sample origins → [B, win_h, win_w(, C)].

    Exact (HIGHEST-precision einsums against 0/1 selectors: every output
    element is one input element times 1.0).  Windows must lie fully
    in-image (``window_origin`` clamps them).  Works for any dtype/channel
    count — the general-dtype companion to the uint8 Pallas
    :func:`crop_windows_batch`."""
    squeeze = frames.ndim == 3
    if squeeze:
        frames = frames[..., None]
    py, px = _window_onehots(
        oys, oxs, win_h, win_w, frames.shape[1], frames.shape[2]
    )
    x = frames.astype(jnp.float32)
    x = jnp.einsum("bih,bhwc->biwc", py, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("bjw,biwc->bijc", px, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = x.astype(frames.dtype)
    return x[..., 0] if squeeze else x


def onehot_scatter_batch(
    wins: Array, oys: Array, oxs: Array, image_h: int, image_w: int
) -> Array:
    """Scatter [B, win_h, win_w(, C)] windows into zero [B, H, W(, C)]
    frames via transposed one-hot matmuls — the gather/scatter-free
    equivalent of per-sample :func:`scatter_window` into zeros when the
    window is pre-masked to its box (the deep pipelines' shape,
    raft_seg.py:159/204 scatter semantics)."""
    squeeze = wins.ndim == 3
    if squeeze:
        wins = wins[..., None]
    win_h, win_w = wins.shape[1:3]
    py, px = _window_onehots(oys, oxs, win_h, win_w, image_h, image_w)
    x = wins.astype(jnp.float32)
    x = jnp.einsum("bih,bijc->bhjc", py, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("bjw,bhjc->bhwc", px, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = x.astype(wins.dtype)
    return x[..., 0] if squeeze else x


def window_box_mask(box: Array, origin_yx, win_h: int, win_w: int) -> Array:
    """Boolean [win_h, win_w] mask of window pixels inside ``box``."""
    oy, ox = origin_yx
    ys = jax.lax.broadcasted_iota(jnp.int32, (win_h, win_w), 0) + oy
    xs = jax.lax.broadcasted_iota(jnp.int32, (win_h, win_w), 1) + ox
    return (ys >= box[1]) & (ys < box[3]) & (xs >= box[0]) & (xs < box[2])


def scatter_window(
    full: Array, window: Array, box: Array, origin_yx
) -> Array:
    """Write window values into ``full`` only inside ``box`` (the
    reference's ``flow[y0:y1, x0:x1] = current_flow`` scatter,
    optical_flow_seg.py:159/204)."""
    win_h, win_w = window.shape[:2]
    mask = window_box_mask(box, origin_yx, win_h, win_w)
    oy, ox = origin_yx
    if full.ndim == 3:
        mask = mask[..., None]
        cur = jax.lax.dynamic_slice(
            full, (oy, ox, 0), (win_h, win_w, full.shape[2])
        )
        new = jnp.where(mask, window, cur)
        return jax.lax.dynamic_update_slice(full, new, (oy, ox, 0))
    cur = jax.lax.dynamic_slice(full, (oy, ox), (win_h, win_w))
    new = jnp.where(mask, window, cur)
    return jax.lax.dynamic_update_slice(full, new, (oy, ox))


def region_percentage(box: Array, image_h: int, image_w: int) -> Array:
    """ROI area as % of the image (logged per frame by every pipeline,
    optical_flow_seg.py:148-151)."""
    area = jnp.maximum(box[2] - box[0], 0) * jnp.maximum(box[3] - box[1], 0)
    return 100.0 * area.astype(jnp.float32) / float(image_h * image_w)
