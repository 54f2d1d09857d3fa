"""TPU-fast batched Farnebäck: batch-in-lanes layout, gather-free warp.

The exact OpenCV-parity implementation (:mod:`nsof_tpu.ops.farneback`)
vmaps single images, leaving two TPU-hostile patterns:

1. single-channel convolutions (no lane utilisation) — here every 1-D
   kernel becomes a *depthwise* conv over a ``[1, H, W, B]`` tensor, so the
   batch rides the 128-wide lane dimension;
2. per-pixel bilinear gathers in the warp (XLA lowers them to scalar
   gathers, ~20 ms each at B=32) — here the warp is a bounded select-shift
   window: S(y,x) = Σ_{ky,kx} I(y+ky, x+kx)·hat(dy−ky)·hat(dx−kx), exact
   for displacements with |d| ≤ ``warp_radius`` at each pyramid level and
   clamped beyond, i.e. total representable motion ≈ radius·2^levels px.

Accuracy contract (measured vs the exact path at radius 3, 256×384):
~0.02 px mean for motions within the radius, ~0.4 px at 2× the radius
(the clamped linearisation point extrapolates through the quadratic
model), unusable beyond ~3–4× — because, like OpenCV, every pyramid level
warps by the FULL flow in that level's pixels, so the finest level needs
reach equal to the full motion.  Pick ``warp_radius`` ≥ expected per-frame
motion in pixels (cost grows as (2r+2)²) or use the exact path
(:mod:`nsof_tpu.ops.farneback`) for unbounded motion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nsof_tpu.ops.farneback import (
    FarnebackParams,
    _BORDER,
    _BORDER_TABLE,
    _cv_round,
    _effective_levels,
    _gaussian_blur_kernel,
    _poly_exp_coeffs,
)

Array = jnp.ndarray


def _dw_conv1d(
    x: Array, kernel: np.ndarray, axis: int, pre_padded: bool = False
) -> Array:
    """Depthwise correlation along H (axis=0) or W (axis=1) of [H, W, B].

    ``pre_padded=True`` skips the edge pad (caller already extended the
    array by k//2 along ``axis``) — lets conv chains share one pad copy.
    """
    k = len(kernel)
    n = k // 2
    b = x.shape[-1]
    if pre_padded:
        xp = x
    else:
        pad = (
            [(n, n), (0, 0), (0, 0)]
            if axis == 0
            else [(0, 0), (n, n), (0, 0)]
        )
        xp = jnp.pad(x, pad, mode="edge")
    shape = (k, 1, 1, 1) if axis == 0 else (1, k, 1, 1)
    kern = jnp.broadcast_to(
        jnp.asarray(kernel, x.dtype).reshape(shape[:2] + (1, 1)),
        shape[:2] + (1, b),
    )
    out = jax.lax.conv_general_dilated(
        xp[None],
        kern,
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b,
    )
    return out[0]


def _shift2(x: Array, ky: int, kx: int) -> Array:
    """x sampled at (y+ky, x+kx) with replicate borders; [H, W, ...]."""
    h, w = x.shape[:2]
    pad = [(max(0, -ky), max(0, ky)), (max(0, -kx), max(0, kx))] + [
        (0, 0)
    ] * (x.ndim - 2)
    xp = jnp.pad(x, pad, mode="edge")
    return xp[
        max(0, ky) : max(0, ky) + h, max(0, kx) : max(0, kx) + w
    ]


def _poly_expansion_channels(img: Array, n: int, sigma: float):
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_coeffs(n, sigma)
    # one shared edge pad per conv input instead of one per conv call
    # (saves 5 full-plane HBM copies per image)
    imgp = jnp.pad(img, ((n, n), (0, 0), (0, 0)), mode="edge")
    s0 = _dw_conv1d(imgp, g, 0, pre_padded=True)
    s1 = _dw_conv1d(imgp, xg, 0, pre_padded=True)
    s2 = _dw_conv1d(imgp, xxg, 0, pre_padded=True)
    s0p = jnp.pad(s0, ((0, 0), (n, n), (0, 0)), mode="edge")
    s1p = jnp.pad(s1, ((0, 0), (n, n), (0, 0)), mode="edge")
    b1 = _dw_conv1d(s0p, g, 1, pre_padded=True)
    b2 = _dw_conv1d(s1p, g, 1, pre_padded=True)
    b3 = _dw_conv1d(s0p, xg, 1, pre_padded=True)
    b4 = _dw_conv1d(s0p, xxg, 1, pre_padded=True)
    b5 = _dw_conv1d(s2, g, 1)
    b6 = _dw_conv1d(s1p, xg, 1, pre_padded=True)
    return [
        b2 * ig11,
        b3 * ig11,
        b1 * ig03 + b5 * ig33,
        b1 * ig03 + b4 * ig33,
        b6 * ig55,
    ]


def poly_expansion_fast(img: Array, n: int, sigma: float) -> Array:
    """[H, W, B] image → [H, W, B, 5] expansion (channels as in the exact
    path: b_y, b_x, a_yy, a_xx, a_xy)."""
    return jnp.stack(_poly_expansion_channels(img, n, sigma), axis=-1)


def _poly_expansion_cm(img: Array, n: int, sigma: float) -> Array:
    """[H, W, B] image → channel-major [5, H, W, B] expansion."""
    return jnp.stack(_poly_expansion_channels(img, n, sigma), axis=0)


def _warp_select(r1: Array, dx: Array, dy: Array, radius: int) -> Array:
    """Gather-free bilinear sample of [H, W, B, 5] at (x+dx, y+dy), exact
    for |dx|,|dy| ≤ radius (hat-basis window), clamped beyond.

    Accumulates channel-by-channel in [H, W, B] tiles (the trailing 5-dim
    would pad to 8 lanesets and blow HLO temp memory at large B).
    """
    dxc = jnp.clip(dx, -radius, radius)
    dyc = jnp.clip(dy, -radius, radius)
    chans = [jnp.zeros_like(dx) for _ in range(r1.shape[-1])]
    for ky in range(-radius, radius + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dyc - ky))
        for kx in range(-radius, radius + 2):
            w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dxc - kx))
            shifted = _shift2(r1, ky, kx)
            for c in range(len(chans)):
                chans[c] = chans[c] + shifted[..., c] * w
    return jnp.stack(chans, axis=-1)


@functools.lru_cache(maxsize=None)
def _border_scale_hw(h: int, w: int):
    def axis_scale(size):
        s = np.ones(size, np.float32)
        for i in range(min(_BORDER, size)):
            s[i] *= _BORDER_TABLE[i]
            s[size - 1 - i] *= _BORDER_TABLE[i]
        return s

    return np.outer(axis_scale(h), axis_scale(w))


def update_matrices_fast(
    r0: Array, r1: Array, flow: Array, radius: int
) -> Array:
    """[H, W, B, 5] expansions + [H, W, B, 2] flow → M [H, W, B, 5]."""
    h, w = r0.shape[:2]
    # The warp reach is bounded by ``radius``; linearise about the CLAMPED
    # displacement (a valid Farnebäck update point) so the A·d0 term stays
    # consistent with where r1 was actually sampled — each iteration then
    # extends the effective reach by `radius` instead of capping total
    # motion at `radius`.
    dx = jnp.clip(flow[..., 0], -radius, radius)
    dy = jnp.clip(flow[..., 1], -radius, radius)
    samp = _warp_select(r1, dx, dy, radius)

    r4 = (r0[..., 2] + samp[..., 2]) * 0.5
    r5 = (r0[..., 3] + samp[..., 3]) * 0.5
    r6 = (r0[..., 4] + samp[..., 4]) * 0.25
    b_y = (r0[..., 0] - samp[..., 0]) * 0.5
    b_x = (r0[..., 1] - samp[..., 1]) * 0.5

    r2 = b_y + r4 * dy + r6 * dx
    r3 = b_x + r6 * dy + r5 * dx

    scale = jnp.asarray(_border_scale_hw(h, w))[..., None]
    r2, r3, r4, r5, r6 = (v * scale for v in (r2, r3, r4, r5, r6))
    return jnp.stack(
        [
            r4 * r4 + r6 * r6,
            (r4 + r5) * r6,
            r5 * r5 + r6 * r6,
            r4 * r2 + r6 * r3,
            r6 * r2 + r5 * r3,
        ],
        axis=-1,
    )


def _update_matrices_kernel(
    dx_ref, dy_ref, r0_ref, bsc_ref, r1p_ref, out_ref, scratch, sem,
    *, radius, halo, th, tw,
):
    """Pallas kernel: fused select-shift warp + least-squares matrix build.

    One (th, tw) spatial tile with batch B on lanes.  The padded second
    expansion r1p lives in HBM; its (th+2·halo, tw+2·halo) slab is DMA'd
    into VMEM once and all (2r+2)² bilinear taps are computed from VMEM —
    HBM traffic drops from taps×channels×plane to ~2 planes per call.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    copy = pltpu.make_async_copy(
        r1p_ref.at[
            :,
            pl.ds(i * th, th + 2 * halo),
            pl.ds(j * tw, tw + 2 * halo),
            pl.ds(k * 128, 128),
        ],
        scratch,
        sem,
    )
    copy.start()

    # clamped displacement used BOTH for sampling and the A·d0 term —
    # see update_matrices_fast for why
    dx = jnp.clip(dx_ref[...], -radius, radius)
    dy = jnp.clip(dy_ref[...], -radius, radius)
    copy.wait()

    acc = [jnp.zeros_like(dx) for _ in range(5)]
    for ky in range(-radius, radius + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - ky))
        for kx in range(-radius, radius + 2):
            w = wy * jnp.maximum(0.0, 1.0 - jnp.abs(dx - kx))
            oy = halo + ky
            ox = halo + kx
            for c in range(5):
                tap = scratch[c, oy : oy + th, ox : ox + tw, :]
                acc[c] = acc[c] + tap * w

    r4 = (r0_ref[2] + acc[2]) * 0.5
    r5 = (r0_ref[3] + acc[3]) * 0.5
    r6 = (r0_ref[4] + acc[4]) * 0.25
    b_y = (r0_ref[0] - acc[0]) * 0.5
    b_x = (r0_ref[1] - acc[1]) * 0.5
    r2 = b_y + r4 * dy + r6 * dx
    r3 = b_x + r6 * dy + r5 * dx

    sc = bsc_ref[...]  # [th, tw, 1], broadcasts over lanes
    r2 = r2 * sc
    r3 = r3 * sc
    r4 = r4 * sc
    r5 = r5 * sc
    r6 = r6 * sc

    out_ref[0] = r4 * r4 + r6 * r6
    out_ref[1] = (r4 + r5) * r6
    out_ref[2] = r5 * r5 + r6 * r6
    out_ref[3] = r4 * r2 + r6 * r3
    out_ref[4] = r6 * r2 + r5 * r3


def _update_matrices_sep_kernel(
    dx_ref, dy_ref, r0_ref, bsc_ref, r1p_ref, dxp_ref, out_ref,
    scratch, dxs, sem, sem2, *, radius, halo, th, tw, hc=None,
    r1_off=(0, 0),
):
    """Separable (two-pass) variant of :func:`_update_matrices_kernel`.

    The (2r+2)² tap product is split into a horizontal pass
    ``T(y',x) = Σ_kx I(y', x+kx)·hat(dx(y',x)−kx)`` (each row interpolated
    at its OWN dx) followed by a vertical pass
    ``S(y,x) = Σ_ky T(y+ky,x)·hat(dy(y,x)−ky)`` — 2·(2r+2) taps instead of
    (2r+2)².  Exact where dx is constant over the ±(r+1)-row vertical
    window; with the box-blurred flow fields Farnebäck iterates on, the
    approximation error is far below the fast path's existing contract
    (measured ~1e-3 px vs the non-separable kernel).
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hc = halo if hc is None else hc  # column halo (8-aligned DMA width)
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    ro, co2 = r1_off  # extra canvas margin of r1p beyond (halo, hc)
    copy = pltpu.make_async_copy(
        r1p_ref.at[
            :,
            pl.ds(i * th + ro, th + 2 * halo),
            pl.ds(j * tw + co2, tw + 2 * hc),
            pl.ds(k * 128, 128),
        ],
        scratch,
        sem,
    )
    copy.start()
    # dx at the slab's rows (edge-padded like r1p), output columns
    copy2 = pltpu.make_async_copy(
        dxp_ref.at[
            pl.ds(i * th, th + 2 * halo),
            pl.ds(j * tw, tw),
            pl.ds(k * 128, 128),
        ],
        dxs,
        sem2,
    )
    copy2.start()

    dx = jnp.clip(dx_ref[...], -radius, radius)
    dy = jnp.clip(dy_ref[...], -radius, radius)
    copy.wait()
    copy2.wait()
    dxh = jnp.clip(dxs[...], -radius, radius)

    # pass 1 (horizontal, per-row dx): T[c] over all slab rows.
    # bf16 expansions keep the pass intermediates bf16 (see the fused
    # kernel for the accuracy note).
    lowp = scratch.dtype == jnp.bfloat16
    wdt = jnp.bfloat16 if lowp else jnp.float32
    t_rows = [None] * 5
    for kx in range(-radius, radius + 2):
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxh - kx)).astype(wdt)
        ox = hc + kx
        for c in range(5):
            tap = scratch[c, :, ox : ox + tw, :] * wx
            t_rows[c] = tap if t_rows[c] is None else t_rows[c] + tap

    # pass 2 (vertical, output-pixel dy)
    acc = [None] * 5
    for ky in range(-radius, radius + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - ky)).astype(wdt)
        oy = halo + ky
        for c in range(5):
            tap = t_rows[c][oy : oy + th, :, :] * wy
            acc[c] = tap if acc[c] is None else acc[c] + tap
    if lowp:
        acc = [a.astype(jnp.float32) for a in acc]
    r0c = [r0_ref[c].astype(jnp.float32) for c in range(5)]

    r4 = (r0c[2] + acc[2]) * 0.5
    r5 = (r0c[3] + acc[3]) * 0.5
    r6 = (r0c[4] + acc[4]) * 0.25
    b_y = (r0c[0] - acc[0]) * 0.5
    b_x = (r0c[1] - acc[1]) * 0.5
    r2 = b_y + r4 * dy + r6 * dx
    r3 = b_x + r6 * dy + r5 * dx

    sc = bsc_ref[...]  # [th, tw, 1], broadcasts over lanes
    r2 = r2 * sc
    r3 = r3 * sc
    r4 = r4 * sc
    r5 = r5 * sc
    r6 = r6 * sc

    mdt = out_ref.dtype
    out_ref[0] = (r4 * r4 + r6 * r6).astype(mdt)
    out_ref[1] = ((r4 + r5) * r6).astype(mdt)
    out_ref[2] = (r5 * r5 + r6 * r6).astype(mdt)
    out_ref[3] = (r4 * r2 + r6 * r3).astype(mdt)
    out_ref[4] = (r6 * r2 + r5 * r3).astype(mdt)


def update_matrices_pallas(
    r0: Array, r1: Array, flow: Array, radius: int, separable: bool = False
) -> Array:
    """Pallas-fused equivalent of :func:`update_matrices_fast`.

    Inputs/outputs in the fast path's [H, W, B, 5] layout; internally
    channel-major [5, H, W, B] tiles with B on the lane dimension.
    ``separable=True`` uses the two-pass warp (~3× fewer VPU FMAs, see
    :func:`_update_matrices_sep_kernel` for the accuracy note).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, b, _ = r0.shape
    if b % 128 != 0:
        # Mosaic requires lane-aligned DMA slices; sub-128 batches go
        # through the XLA select-shift path instead
        return update_matrices_fast(r0, r1, flow, radius)
    halo = 4 if radius <= 3 else 8
    assert radius + 1 <= halo
    # tile sizes chosen to fit VMEM with Pallas' double-buffered operand
    # blocks: ~(2·dx + r0 + out)·2 + scratch ≈ 9 MB at B=128.  The
    # separable kernel's pass-1 cost scales with (th + 2·halo)/th, so it
    # prefers taller tiles (narrower to stay within VMEM).
    if separable:
        th = 16
        tw = min(32, w)
    else:
        th = 8
        tw = min(64, w)
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw

    r0c = jnp.moveaxis(r0, -1, 0)
    r1c = jnp.moveaxis(r1, -1, 0)
    dx = flow[..., 0]
    dy = flow[..., 1]

    # spatial pad to tile multiples (edge mode keeps warp semantics at the
    # image border), plus halo padding for r1
    def pad_hw(x, extra=0):
        return jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 3)
            + [
                (extra, hp - h + extra),
                (extra, wp - w + extra),
                (0, 0),
            ],
            mode="edge",
        )

    r0p = pad_hw(r0c)
    r1p = pad_hw(r1c, extra=halo)
    dxp = pad_hw(dx)
    dyp = pad_hw(dy)
    bsc = jnp.asarray(_border_scale_hw(h, w))[..., None]
    bscp = jnp.pad(bsc, [(0, hp - h), (0, wp - w), (0, 0)], mode="edge")

    bc = 128  # lane-chunk of the batch dimension
    grid = (hp // th, wp // tw, b // bc)
    common_in_specs = [
        pl.BlockSpec((th, tw, bc), lambda i, j, k: (i, j, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((th, tw, bc), lambda i, j, k: (i, j, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((5, th, tw, bc), lambda i, j, k: (0, i, j, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((th, tw, 1), lambda i, j, k: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if separable:
        # dx with row halo only (pass-1 rows), output columns
        dxrp = jnp.pad(
            dx, [(halo, hp - h + halo), (0, wp - w), (0, 0)], mode="edge"
        )
        kernel = functools.partial(
            _update_matrices_sep_kernel, radius=radius, halo=halo,
            th=th, tw=tw,
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=common_in_specs + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((5, th, tw, bc),
                                   lambda i, j, k: (0, i, j, k),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((5, hp, wp, b), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((5, th + 2 * halo, tw + 2 * halo, bc),
                           jnp.float32),
                pltpu.VMEM((th + 2 * halo, tw, bc), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )(dxp, dyp, r0p, bscp, r1p, dxrp)
    else:
        kernel = functools.partial(
            _update_matrices_kernel, radius=radius, halo=halo, th=th, tw=tw
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=common_in_specs,
            out_specs=pl.BlockSpec((5, th, tw, bc),
                                   lambda i, j, k: (0, i, j, k),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((5, hp, wp, b), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((5, th + 2 * halo, tw + 2 * halo, bc),
                           jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(dxp, dyp, r0p, bscp, r1p)
    return jnp.moveaxis(out[:, :h, :w], 0, -1)


def _box_solve_kernel(mp_ref, out_ref, scratch, sem, *, m, halo, th, tw,
                      scale):
    """Pallas kernel: box-smooth the 5-channel system and solve the 2×2
    flow equations, all from one VMEM-resident slab — the box sums never
    round-trip HBM."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    copy = pltpu.make_async_copy(
        mp_ref.at[
            :,
            pl.ds(i * th, th + 2 * halo),
            pl.ds(j * tw, tw + 2 * halo),
            pl.ds(k * 128, 128),
        ],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    def win_sum(a, axis, n_out):
        """Log-tree (2m+1)-window sum along ``axis``; a extends n_out+2m
        there, output starts at offset halo-m.  O(log win) array adds
        instead of 2m+1."""
        win = 2 * m + 1
        off0 = halo - m

        def sl(x, start, length):
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(start, start + length)
            return x[tuple(idx)]

        # S_k(y) = sum of 2^k consecutive starting at y
        levels = [a]
        step = 1
        while step * 2 <= win:
            prev = levels[-1]
            ext = prev.shape[axis] - step
            levels.append(sl(prev, 0, ext) + sl(prev, step, ext))
            step *= 2
        out = None
        pos = off0
        for kbit in range(len(levels) - 1, -1, -1):
            if win & (1 << kbit):
                part = sl(levels[kbit], pos, n_out)
                out = part if out is None else out + part
                pos += 1 << kbit
        return out

    sums = []
    for c in range(5):
        vert = win_sum(scratch[c, :, :, :], 0, th)
        sums.append(win_sum(vert, 1, tw) * scale)

    g11, g12, g22, h1, h2 = sums
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    out_ref[0] = (g11 * h2 - g12 * h1) * idet  # dx
    out_ref[1] = (g22 * h1 - g12 * h2) * idet  # dy


def box_solve_pallas(m_arr: Array, winsize: int) -> Array:
    """[H, W, B, 5] system → [H, W, B, 2] flow via the fused kernel."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w, b, _ = m_arr.shape
    m = winsize // 2
    if b % 128 != 0 or m > 8:
        ms = _box_sum_dw(m_arr, m) * (1.0 / (winsize * winsize))
        g11, g12, g22, h1, h2 = (ms[..., i] for i in range(5))
        idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
        return jnp.stack(
            [(g11 * h2 - g12 * h1) * idet, (g22 * h1 - g12 * h2) * idet],
            axis=-1,
        )
    halo = 8  # covers m ≤ 8 with sublane-aligned slabs
    th = 16
    tw = min(32, w)
    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    mc = jnp.moveaxis(m_arr, -1, 0)
    mp = jnp.pad(
        mc,
        ((0, 0), (halo, hp - h + halo), (halo, wp - w + halo), (0, 0)),
        mode="edge",
    )
    kernel = functools.partial(
        _box_solve_kernel, m=m, halo=halo, th=th, tw=tw,
        scale=1.0 / (winsize * winsize),
    )
    out = pl.pallas_call(
        kernel,
        grid=(hp // th, wp // tw, b // 128),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (2, th, tw, 128), lambda i, j, k: (0, i, j, k),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, hp, wp, b), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((5, th + 2 * halo, tw + 2 * halo, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(mp)
    return jnp.moveaxis(out[:, :h, :w], 0, -1)


def _poly_expansion_kernel(
    imgp_ref, out_ref, slab, sem, *, g, xg, xxg, igs, n, th, tw,
    blur=None,
):
    """Pallas poly expansion: one (th, tw) tile of all 5 coefficient
    planes from a single VMEM slab of the edge-padded image.

    Replaces 9 XLA grouped convolutions per image, each of which lowers
    on TPU to bf16 layout-conversion fusions costing ~1 ms at 256×384×256
    (profiled); here the separable taps run in f32 straight from VMEM.
    Tap folding uses the kernel symmetries (g, xxg even; xg odd).
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    co = 8  # column halo of the padded image (n (+blur) <= 8 enforced)
    nb = 0 if blur is None else len(blur) // 2
    hr = n + nb  # row halo
    copy = pltpu.make_async_copy(
        imgp_ref.at[
            pl.ds(i * th, th + 2 * hr),
            pl.ds(j * tw, tw + 2 * co),
            pl.ds(k * 128, 128),
        ],
        slab,
        sem,
    )
    copy.start()
    copy.wait()

    ig11, ig03, ig33, ig55 = igs

    if blur is None:
        src = slab  # rows th+2n, cols tw+2co; poly row r at slab row r
    else:
        # fused pre-smoothing (the per-level Gaussian, level 0 only where
        # no resize follows): separable blur of the slab, consuming the
        # extra nb halo; border band uses edge padding (the XLA path uses
        # reflect — differs only in the outermost nb rows/cols).
        rows = th + 2 * n
        v = None
        for t in range(-nb, nb + 1):
            term = blur[nb + t] * slab[nb + t : nb + t + rows]
            v = term if v is None else v + term
        h = None
        width = tw + 2 * (co - nb)
        for t in range(-nb, nb + 1):
            term = blur[nb + t] * v[:, nb + t : nb + t + width]
            h = term if h is None else h + term
        src = h  # rows th+2n, cols tw+2(co-nb); poly col anchor co-nb

    pco = co - nb  # poly's column anchor within src

    def vert(kern, odd):
        acc = kern[n] * src[n : n + th] if not odd else None
        for t in range(1, n + 1):
            hi = src[n + t : n + t + th]
            lo = src[n - t : n - t + th]
            term = kern[n + t] * ((hi - lo) if odd else (hi + lo))
            acc = term if acc is None else acc + term
        return acc  # [th, src_cols, 128]

    s0 = vert(g, False)
    s1 = vert(xg, True)
    s2 = vert(xxg, False)

    def horiz(s, kern, odd):
        acc = (
            None if odd
            else kern[n] * s[:, pco : pco + tw]
        )
        for t in range(1, n + 1):
            hi = s[:, pco + t : pco + t + tw]
            lo = s[:, pco - t : pco - t + tw]
            term = kern[n + t] * ((hi - lo) if odd else (hi + lo))
            acc = term if acc is None else acc + term
        return acc  # [th, tw, 128]

    b1 = horiz(s0, g, False)
    b2 = horiz(s1, g, False)
    b3 = horiz(s0, xg, True)
    b4 = horiz(s0, xxg, False)
    b5 = horiz(s2, g, False)
    b6 = horiz(s1, xg, True)

    out_ref[0] = b2 * ig11
    out_ref[1] = b3 * ig11
    out_ref[2] = b1 * ig03 + b5 * ig33
    out_ref[3] = b1 * ig03 + b4 * ig33
    out_ref[4] = b6 * ig55


def _poly_expansion_cm_pallas(
    img: Array, n: int, sigma: float, hp: int, wp: int,
    blur_kernel=None, th: int = 16, tw: int = 32,
    margin: tuple[int, int] = (0, 0),
) -> Array:
    """[hk, wk, B] image → channel-major [5, hp+2mr, wp+2mc, B] expansion
    on the tile-padded canvas (slack rows/cols are
    poly-of-edge-padded-image — within ~2 border rows of exact replicate,
    see the level driver).  ``blur_kernel`` fuses the level's Gaussian
    pre-smoothing into the same slab pass (level 0, where no resize
    follows).  ``margin=(mr, mc)`` emits an extra ring (multiples of
    th/tw) so consumers that need a halo (e.g. the warp's r1) read the
    canvas directly instead of a 500 MB jnp.pad copy."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hk, wk, b = img.shape
    mr, mc = margin
    assert mr % th == 0 and mc % tw == 0, (margin, th, tw)
    nb = 0 if blur_kernel is None else len(blur_kernel) // 2
    assert n + nb <= 8 and 8 - nb >= n, (n, nb)
    hr = n + nb
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_coeffs(n, sigma)
    imgp = jnp.pad(
        img,
        ((hr + mr, hp - hk + hr + mr),
         (8 + mc, wp - wk + 8 + mc), (0, 0)),
        mode="edge",
    )
    hp = hp + 2 * mr
    wp = wp + 2 * mc
    kernel = functools.partial(
        _poly_expansion_kernel,
        g=tuple(float(v) for v in g),
        xg=tuple(float(v) for v in xg),
        xxg=tuple(float(v) for v in xxg),
        igs=(float(ig11), float(ig03), float(ig33), float(ig55)),
        n=n, th=th, tw=tw,
        blur=(None if blur_kernel is None
              else tuple(float(v) for v in blur_kernel)),
    )
    return pl.pallas_call(
        kernel,
        grid=(hp // th, wp // tw, b // 128),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (5, th, tw, 128), lambda i, j, k: (0, i, j, k),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((5, hp, wp, b), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * hr, tw + 16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(imgp)


def _update_matrices_sep_cm(
    dxt: Array, dyt: Array, r0t: Array, bscp: Array, r1p: Array,
    dxrp: Array, radius: int, th: int, tw: int,
    out_dtype=jnp.float32, r1_off=(0, 0),
) -> Array:
    """Channel-major separable update on pre-padded operands (no per-call
    layout moves): r0t [5,hp,wp,b], r1p [5,hp+2e,wp+16,b] (row halo
    e=radius+1, col halo 8 for DMA alignment), dxt/dyt [hp,wp,b],
    dxrp [hp+2e,wp,b], bscp [hp,wp,1]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, hp, wp, b = r0t.shape
    e = radius + 1
    hc = 8
    kernel = functools.partial(
        _update_matrices_sep_kernel, radius=radius, halo=e, th=th, tw=tw,
        hc=hc, r1_off=r1_off,
    )
    return pl.pallas_call(
        kernel,
        grid=(hp // th, wp // tw, b // 128),
        compiler_params=_vmem_params(th),
        in_specs=[
            pl.BlockSpec((th, tw, 128), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw, 128), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, th, tw, 128), lambda i, j, k: (0, i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw, 1), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((5, th, tw, 128),
                               lambda i, j, k: (0, i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, hp, wp, b), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((5, th + 2 * e, tw + 2 * hc, 128), r1p.dtype),
            pltpu.VMEM((th + 2 * e, tw, 128), dxrp.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(dxt, dyt, r0t, bscp, r1p, dxrp)


def _win_sum_rows_running(a, n_out: int, off0: int, win: int):
    """Sliding-window sum along the ROW (outer, un-tiled) axis of
    [R, C, 128] via a sequential recurrence: S(r) = S(r−1) + a[top] −
    a[bottom].  2 row-ops per output row instead of log(win) full-slab
    ops — the rows axis is cheap to slice, so this is ~4× less VPU work
    than the tree for win=15.  Accumulates in f32 (the recurrence adds
    ~R ulp of rounding vs the tree — far below the bf16 storage noise).
    """
    import jax.numpy as jnp

    def row(r):
        return a[r].astype(jnp.float32)

    s = row(off0)
    for t in range(1, win):
        s = s + row(off0 + t)
    rows = [s]
    for r in range(1, n_out):
        s = s + row(off0 + r + win - 1) - row(off0 + r - 1)
        rows.append(s)
    return jnp.stack(rows, axis=0)


def _win_sum_tree(a, axis: int, n_out: int, off0: int, win: int):
    """Log-tree sliding-window sum: out[i] = Σ_{t<win} a[off0+i+t] along
    ``axis``; O(log win) array adds instead of ``win``."""

    def sl(x, start, length):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + length)
        return x[tuple(idx)]

    levels = [a]
    step = 1
    while step * 2 <= win:
        prev = levels[-1]
        ext = prev.shape[axis] - step
        levels.append(sl(prev, 0, ext) + sl(prev, step, ext))
        step *= 2
    out = None
    pos = off0
    for kbit in range(len(levels) - 1, -1, -1):
        if win & (1 << kbit):
            part = sl(levels[kbit], pos, n_out)
            out = part if out is None else out + part
            pos += 1 << kbit
    return out


def _vmem_params(th: int):
    """Raise Mosaic's VMEM scoped limit for tall tiles (the default is a
    conservative 16 MB; v5e has far more physical VMEM — tall tiles
    amortize the row-halo overlap and the running-sum init)."""
    from jax.experimental.pallas import tpu as pltpu

    if th <= 16:
        return None
    params_cls = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams"
    )
    return params_cls(vmem_limit_bytes=100 * 1024 * 1024)


def _fused_box_update_kernel(
    bsc_ref, mp_ref, r1p_ref, r0p_ref, out_ref, mslab, r1slab, r0slab,
    sem, sem2, sem3, *, radius, m, th, tw, pp, scale, emit,
    r1_off=(0, 0),
):
    """Per-iteration Farnebäck step in ONE kernel: box-smooth the previous
    5-channel system M, solve the 2×2 flow equations, separable-warp r1 by
    that flow, and emit the NEXT system M' — the intermediate flow never
    touches HBM (it exists only on the (th+2(r+1), tw) tile).

    ``emit='matrices'``: full step, writes M' (5ch).  Needs flow at the
    tile's ±(r+1) row halo for warp pass 1, so the box solve runs on
    th+2(r+1) rows and ``pp`` (the M padding) must be m+radius+1.
    ``emit='flow'``: final iteration, just box+solve, writes flow (2ch);
    ``pp`` = m.

    M is stored bf16 in HBM (halves the dominant DMA stream; box sums
    accumulate in f32, ~0.4 % relative input noise — inside the fast
    path's accuracy contract).  r0/r1 stay f32: the b_y/b_x terms are
    differences of nearly-equal expansions and would cancel in bf16.
    The r0/r1 slab DMAs are issued up front and their latency hides
    behind the box+solve compute.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    e = radius + 1
    mc = 8  # column halo of the M pad (16-aligned bf16 DMA width; mc >= m)
    ec = 8  # column halo of the r1 pad
    n_flow_rows = th + 2 * e if emit == "matrices" else th

    copy = pltpu.make_async_copy(
        mp_ref.at[
            :,
            pl.ds(i * th, th + 2 * pp),
            pl.ds(j * tw, tw + 2 * mc),
            pl.ds(k * 128, 128),
        ],
        mslab,
        sem,
    )
    copy.start()
    if emit == "matrices":
        ro, co2 = r1_off
        copy2 = pltpu.make_async_copy(
            r1p_ref.at[
                :,
                pl.ds(i * th + ro, th + 2 * e),
                pl.ds(j * tw + co2, tw + 2 * ec),
                pl.ds(k * 128, 128),
            ],
            r1slab,
            sem2,
        )
        copy2.start()
        copy3 = pltpu.make_async_copy(
            r0p_ref.at[
                :,
                pl.ds(i * th, th),
                pl.ds(j * tw, tw),
                pl.ds(k * 128, 128),
            ],
            r0slab,
            sem3,
        )
        copy3.start()
    copy.wait()

    # box sums + 2×2 solve on the extended row window.
    # Slab row 0 = absolute row y0 − pp; flow row f = absolute
    # y0 − (pp − m) + f, so its (2m+1) window starts at slab row f.
    # Slab col 0 = absolute x0 − mc; flow col x's window starts at
    # slab col x + (mc − m).
    sums = []
    for c in range(5):
        vert = _win_sum_rows_running(mslab[c], n_flow_rows, 0, 2 * m + 1)
        sums.append(
            _win_sum_tree(vert, 1, tw, mc - m, 2 * m + 1) * scale
        )
    g11, g12, g22, h1, h2 = sums
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    dxg = (g11 * h2 - g12 * h1) * idet
    dyg = (g22 * h1 - g12 * h2) * idet

    if emit == "flow":
        out_ref[0] = dxg
        out_ref[1] = dyg
        return

    copy2.wait()
    copy3.wait()
    # clamped displacement used BOTH for sampling and the A·d0 term
    dxh = jnp.clip(dxg, -radius, radius)  # all th+2e rows (warp pass 1)
    dx = dxh[e : e + th]
    dy = jnp.clip(dyg[e : e + th], -radius, radius)

    # separable warp (see _update_matrices_sep_kernel for the contract).
    # With bf16 expansions the pass-1/2 intermediates stay bf16 too
    # (halves the dominant VMEM temporaries; noise is averaged out by the
    # box sum of the NEXT iteration — measured EPE unchanged).
    lowp = r1slab.dtype == jnp.bfloat16
    wdt = jnp.bfloat16 if lowp else jnp.float32
    t_rows = [None] * 5
    for kx in range(-radius, radius + 2):
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxh - kx)).astype(wdt)
        ox = ec + kx
        for c in range(5):
            tap = r1slab[c, :, ox : ox + tw, :] * wx
            t_rows[c] = tap if t_rows[c] is None else t_rows[c] + tap
    acc = [None] * 5
    for ky in range(-radius, radius + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - ky)).astype(wdt)
        oy = e + ky
        for c in range(5):
            tap = t_rows[c][oy : oy + th, :, :] * wy
            acc[c] = tap if acc[c] is None else acc[c] + tap
    if lowp:
        acc = [a.astype(jnp.float32) for a in acc]
        r0c = [r0slab[c].astype(jnp.float32) for c in range(5)]
    else:
        r0c = [r0slab[c] for c in range(5)]

    r4 = (r0c[2] + acc[2]) * 0.5
    r5 = (r0c[3] + acc[3]) * 0.5
    r6 = (r0c[4] + acc[4]) * 0.25
    b_y = (r0c[0] - acc[0]) * 0.5
    b_x = (r0c[1] - acc[1]) * 0.5
    r2 = b_y + r4 * dy + r6 * dx
    r3 = b_x + r6 * dy + r5 * dx

    sc = bsc_ref[...]
    r2 = r2 * sc
    r3 = r3 * sc
    r4 = r4 * sc
    r5 = r5 * sc
    r6 = r6 * sc

    mdt = out_ref.dtype
    out_ref[0] = (r4 * r4 + r6 * r6).astype(mdt)
    out_ref[1] = ((r4 + r5) * r6).astype(mdt)
    out_ref[2] = (r5 * r5 + r6 * r6).astype(mdt)
    out_ref[3] = (r4 * r2 + r6 * r3).astype(mdt)
    out_ref[4] = (r6 * r2 + r5 * r3).astype(mdt)


def _fused_box_update_cm(
    m_arr: Array,
    r0t: Array,
    bscp: Array,
    r1p: Array,
    winsize: int,
    radius: int,
    emit: str,
    th: int,
    tw: int,
    r1_off=(0, 0),
) -> Array:
    """Channel-major fused iteration step.

    m_arr [5,hp,wp,b] (tile-padded, f32 or bf16), r0t [5,hp,wp,b],
    bscp [hp,wp,1], r1p [5,hp+2e,wp+16,b] with e=radius+1 (col halo 8
    for DMA alignment).  Returns M' [5,hp,wp,b] in m_arr's dtype
    (emit='matrices') or f32 flow [2,hp,wp,b] (emit='flow')."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _, hp, wp, b = m_arr.shape
    mm = winsize // 2
    e = radius + 1
    pp = mm + e if emit == "matrices" else mm
    mdt = m_arr.dtype
    if mdt == jnp.bfloat16:
        assert tw % 16 == 0, tw  # bf16 DMA slice width must be 16-aligned
    mp = jnp.pad(
        m_arr, ((0, 0), (pp, pp), (8, 8), (0, 0)), mode="edge"
    )
    kernel = functools.partial(
        _fused_box_update_kernel,
        radius=radius, m=mm, th=th, tw=tw, pp=pp,
        scale=1.0 / (winsize * winsize), emit=emit, r1_off=r1_off,
    )
    if emit == "matrices":
        n_out_ch = 5
        out_dtype = mdt
        r1_slab = (5, th + 2 * e, tw + 16, 128)
        r0_slab = (5, th, tw, 128)
    else:
        # flow emit touches neither r0 nor r1 — feed 1-element dummies
        n_out_ch = 2
        out_dtype = jnp.float32
        r1p = jnp.zeros((1,), jnp.float32)
        r0t = jnp.zeros((1,), jnp.float32)
        r1_slab = (1,)
        r0_slab = (1,)
    out = pl.pallas_call(
        kernel,
        grid=(hp // th, wp // tw, b // 128),
        compiler_params=_vmem_params(th),
        in_specs=[
            pl.BlockSpec((th, tw, 1), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (n_out_ch, th, tw, 128), lambda i, j, k: (0, i, j, k),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_out_ch, hp, wp, b), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((5, th + 2 * pp, tw + 16, 128), mdt),
            pltpu.VMEM(r1_slab, r1p.dtype),
            pltpu.VMEM(r0_slab, r0t.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(bscp, mp, r1p, r0t)
    return out


def _box_sum_dw(x: Array, m: int) -> Array:
    """[H, W, B*] box sum (2m+1)² with replicate borders, depthwise."""
    k = np.ones(2 * m + 1, np.float32)
    shp = x.shape
    flat = x.reshape(shp[0], shp[1], -1)
    out = _dw_conv1d(_dw_conv1d(flat, k, 0), k, 1)
    return out.reshape(shp)


def update_flow_blur_fast(r0, r1, flow, m, winsize: int, radius: int,
                          update_mats: bool, update_fn=None,
                          use_pallas_solve: bool = False):
    if use_pallas_solve:
        flow = box_solve_pallas(m, winsize)
    else:
        half = winsize // 2
        scale = 1.0 / (winsize * winsize)
        ms = _box_sum_dw(m, half) * scale
        g11, g12, g22, h1, h2 = (ms[..., i] for i in range(5))
        idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
        flow = jnp.stack(
            [(g11 * h2 - g12 * h1) * idet, (g22 * h1 - g12 * h2) * idet],
            axis=-1,
        )
    if update_mats:
        m = (update_fn or update_matrices_fast)(r0, r1, flow, radius)
    return flow, m


def _blur_valid(xp: Array, k: np.ndarray) -> Array:
    """Separable valid-mode blur of a pre-padded [H+2n, W+2n, B] image."""
    n = len(k) // 2
    b = xp.shape[-1]
    kern_v = jnp.broadcast_to(
        jnp.asarray(k, xp.dtype).reshape(len(k), 1, 1, 1), (len(k), 1, 1, b)
    )
    kern_h = jnp.broadcast_to(
        jnp.asarray(k, xp.dtype).reshape(1, len(k), 1, 1), (1, len(k), 1, b)
    )
    out = jax.lax.conv_general_dilated(
        xp[None], kern_v, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=b,
    )
    out = jax.lax.conv_general_dilated(
        out, kern_h, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=b,
    )
    return out[0]


def _resize_hwb(img: Array, out_h: int, out_w: int) -> Array:
    if img.shape[:2] == (out_h, out_w):
        return img
    return jax.image.resize(
        img, (out_h, out_w) + img.shape[2:], "bilinear", antialias=False
    )


# fused-path spatial tile; rows are un-tiled in [5,H,W,B] layout so th is
# free, tw rides the 8-sublane dimension (16-aligned for bf16 M DMAs).
# Swept at B=1536/256x384 on v5e: 8x32 449 ms, 16x32 416, 32x32 403,
# 48x32 465, 64x32 412, 128x32 430 — 32x32 amortises the halo DMAs best
# while the per-tile VMEM stays within Mosaic's budget.  Tile size only
# reassociates the f32 window sums (≤4e-3 px vs 16x32, re-audited).
FUSED_TH = 32
FUSED_TW = 32


def _farneback_fast_fused(
    prev: Array, next_: Array, params: FarnebackParams, radius: int,
    m_dtype=jnp.bfloat16,
    tiles: tuple[int, int] | None = None,
    out_layout: str = "bhw2",
) -> Array:
    """Fused per-iteration pipeline: channel-major [5,H,W,B] operands
    padded ONCE per level, one Pallas kernel per Farnebäck iteration
    (box-smooth + solve + warp + matrix build), intermediate flow never
    written to HBM.  The running system M is stored in ``m_dtype``
    (bf16 by default — see the kernel docstring for the accuracy note)."""
    b, h, w = prev.shape
    img0 = jnp.asarray(prev, jnp.float32).transpose(1, 2, 0)
    img1 = jnp.asarray(next_, jnp.float32).transpose(1, 2, 0)
    e = radius + 1
    levels = _effective_levels(h, w, params.levels, params.pyr_scale)

    # Pyramid images for levels >= 1, built fine→coarse as a cascade.
    # cv2 blurs the ORIGINAL image at FULL resolution for every level
    # (optical_flow_seg.py:203's calcOpticalFlowFarneback semantics) —
    # ~35 ms of the level loop at 256×384×1536.  Level 1 keeps that
    # construction exactly; deeper levels blur the PREVIOUS level at its
    # own (already decimated) resolution with the Gaussian-semigroup
    # incremental sigma, σ_inc² = σ_k² − σ_{k−1}², both expressed on the
    # level-(k−1) grid — O(scaleᵏ) work per level instead of O(1).
    # Approximation is audit-gated per preset (RESULTS.md fast-path
    # table; tests/test_fast_audit.py pins the agreement floors).
    lvl_imgs: dict[int, tuple[Array, Array]] = {}
    cur0, cur1 = img0, img1
    for k in range(1, levels + 1):
        scale = params.pyr_scale**k
        sigma_k = (1.0 / scale - 1.0) * 0.5
        wk_ = _cv_round(w * scale)
        hk_ = _cv_round(h * scale)
        if k == 1:
            sz = max(_cv_round(sigma_k * 5) | 1, 3)
            s_blur = sigma_k
        else:
            prev_scale = params.pyr_scale ** (k - 1)
            sigma_prev = (1.0 / prev_scale - 1.0) * 0.5
            tgt = sigma_k * prev_scale
            acc = sigma_prev * prev_scale
            s_blur = float(np.sqrt(max(tgt * tgt - acc * acc, 1e-12)))
            sz = max(2 * int(np.ceil(3.0 * s_blur)) + 1, 3)
        gk = _gaussian_blur_kernel(sz, s_blur)
        nb = sz // 2
        cur0 = _resize_hwb(
            _blur_valid(
                jnp.pad(cur0, ((nb, nb), (nb, nb), (0, 0)),
                        mode="reflect"),
                gk,
            ),
            hk_, wk_,
        )
        cur1 = _resize_hwb(
            _blur_valid(
                jnp.pad(cur1, ((nb, nb), (nb, nb), (0, 0)),
                        mode="reflect"),
                gk,
            ),
            hk_, wk_,
        )
        lvl_imgs[k] = (cur0, cur1)

    dx = dy = None
    for k in range(levels, -1, -1):
        scale = params.pyr_scale**k
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(_cv_round(sigma * 5) | 1, 3)
        wk = _cv_round(w * scale)
        hk = _cv_round(h * scale)
        th, tw = tiles if tiles is not None else (FUSED_TH, FUSED_TW)
        # the initial-update kernel runs at tw=32 (its separable-warp
        # temporaries need the headroom); wp covers both grids
        tw_u = min(tw, 32)
        wlcm = tw * tw_u // np.gcd(tw, tw_u)
        hp = -(-hk // th) * th
        wp = -(-wk // wlcm) * wlcm

        n = smooth_sz // 2
        gk_blur = _gaussian_blur_kernel(smooth_sz, sigma)
        if k == 0:
            # level 0 never resizes: fuse the (3-tap) Gaussian into the
            # Pallas poly pass — no XLA conv machinery at full res
            r0c = _poly_expansion_cm_pallas(
                img0, params.poly_n, params.poly_sigma, hp, wp,
                blur_kernel=gk_blur,
            )
            r1c = _poly_expansion_cm_pallas(
                img1, params.poly_n, params.poly_sigma, hp, wp,
                blur_kernel=gk_blur, th=8, tw=16, margin=(8, 16),
            )
        else:
            i0, i1 = lvl_imgs[k]
            r0c = _poly_expansion_cm_pallas(
                i0, params.poly_n, params.poly_sigma, hp, wp
            )
            r1c = _poly_expansion_cm_pallas(
                i1, params.poly_n, params.poly_sigma, hp, wp,
                th=8, tw=16, margin=(8, 16),
            )

        def padc(x, er=0, ec=0):
            return jnp.pad(
                x,
                [(0, 0)] * (x.ndim - 3)
                + [(er, hp - hk + er), (ec, wp - wk + ec), (0, 0)],
                mode="edge",
            )

        r0t = r0c  # already on the (hp, wp) canvas
        # r1 canvas carries its own (8, 16) margin ring ⊇ the (e, 8)
        # halo the warp kernels need — no jnp.pad copy; consumers
        # offset their DMAs into it
        r1p = r1c
        r1_off = (8 - e, 16 - 8)
        if dx is None:
            dxt = jnp.zeros((hp, wp, b), jnp.float32)
            dyt = dxt
            dxrp = jnp.zeros((hp + 2 * e, wp, b), jnp.float32)
        else:
            dx = _resize_hwb(dx, hk, wk) * (1.0 / params.pyr_scale)
            dy = _resize_hwb(dy, hk, wk) * (1.0 / params.pyr_scale)
            dxt = padc(dx)
            dyt = padc(dy)
            dxrp = jnp.pad(
                dx, [(e, hp - hk + e), (0, wp - wk), (0, 0)], mode="edge"
            )
        bscp = jnp.pad(
            jnp.asarray(_border_scale_hw(hk, wk))[..., None],
            [(0, hp - hk), (0, wp - wk), (0, 0)],
            mode="edge",
        )

        m = _update_matrices_sep_cm(
            dxt, dyt, r0t, bscp, r1p, dxrp, radius, th, tw_u,
            out_dtype=m_dtype, r1_off=r1_off,
        )
        for _ in range(params.iterations - 1):
            m = _fused_box_update_cm(
                m, r0t, bscp, r1p, params.winsize, radius, "matrices",
                th, tw, r1_off=r1_off,
            )
        fl = _fused_box_update_cm(
            m, r0t, bscp, r1p, params.winsize, radius, "flow", th, tw,
            r1_off=r1_off,
        )
        dx = fl[0, :hk, :wk]
        dy = fl[1, :hk, :wk]
    if out_layout == "planes":
        return dx, dy  # native [H, W, B] planes — no transpose copies
    return jnp.stack([dx, dy], axis=-1).transpose(2, 0, 1, 3)


@functools.partial(
    jax.jit,
    static_argnames=("params", "warp_radius", "kernel_mode", "out_layout"),
)
def farneback_fast(
    prev: Array,
    next_: Array,
    params: FarnebackParams = FarnebackParams(),
    warp_radius: int = 4,
    kernel_mode: str = "auto",
    out_layout: str = "bhw2",
) -> Array:
    """Batched dense flow: [B, H, W] uint8/float pairs → [B, H, W, 2].

    TPU fast path; see module docstring for the accuracy contract.
    ``kernel_mode``: 'fused' runs one Pallas kernel per Farnebäck
    iteration (box+solve+warp+matrix build, fastest), 'pallas_sep' the
    two-pass separable warp kernel with a separate box-solve kernel,
    'pallas' the non-separable variant, 'xla' the pure-jnp select-shift,
    'auto' picks fused on TPU backends.
    """
    b_sz = prev.shape[0]
    if kernel_mode == "auto":
        kernel_mode = (
            "fused" if jax.default_backend() == "tpu" else "xla"
        )
    if kernel_mode in ("fused", "fused_f32"):
        # (a bf16-expansions variant was tried and REMOVED: Mosaic's
        # unaligned bf16 sublane slices cost more than the DMA they
        # save — ~30 % slower than 'fused' on v5e)
        # the fused kernels keep halos inside an 8-row slab ring: winsize
        # half-window, poly_n (cv2 half-neighbourhood: window = 2n+1) and,
        # at level 0, poly_n + the fused 3-tap blur must all fit
        if b_sz % 128 != 0 or params.winsize // 2 > 8 or params.poly_n > 7:
            kernel_mode = "pallas_sep"  # falls through to XLA helpers
        else:
            mdt = (jnp.float32 if kernel_mode == "fused_f32"
                   else jnp.bfloat16)
            return _farneback_fast_fused(
                prev, next_, params, warp_radius, m_dtype=mdt,
                out_layout=out_layout,
            )
    if kernel_mode == "pallas_sep":
        def update_fn(r0, r1, f, rad):
            return update_matrices_pallas(r0, r1, f, rad, separable=True)
    elif kernel_mode == "pallas":
        update_fn = update_matrices_pallas
    else:
        update_fn = update_matrices_fast
    b, h, w = prev.shape
    img0 = jnp.asarray(prev, jnp.float32).transpose(1, 2, 0)  # [H, W, B]
    img1 = jnp.asarray(next_, jnp.float32).transpose(1, 2, 0)

    levels = _effective_levels(h, w, params.levels, params.pyr_scale)
    flow = None
    for k in range(levels, -1, -1):
        scale = params.pyr_scale**k
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(_cv_round(sigma * 5) | 1, 3)
        wk = _cv_round(w * scale)
        hk = _cv_round(h * scale)

        if flow is None:
            flow = jnp.zeros((hk, wk, b, 2), jnp.float32)
        else:
            flow = _resize_hwb(flow, hk, wk) * (1.0 / params.pyr_scale)

        n = smooth_sz // 2
        i0 = _resize_hwb(
            _blur_valid(
                jnp.pad(img0, ((n, n), (n, n), (0, 0)), mode="reflect"),
                _gaussian_blur_kernel(smooth_sz, sigma),
            ),
            hk,
            wk,
        )
        i1 = _resize_hwb(
            _blur_valid(
                jnp.pad(img1, ((n, n), (n, n), (0, 0)), mode="reflect"),
                _gaussian_blur_kernel(smooth_sz, sigma),
            ),
            hk,
            wk,
        )
        r0 = poly_expansion_fast(i0, params.poly_n, params.poly_sigma)
        r1 = poly_expansion_fast(i1, params.poly_n, params.poly_sigma)
        m = update_fn(r0, r1, flow, warp_radius)
        for i in range(params.iterations):
            flow, m = update_flow_blur_fast(
                r0, r1, flow, m, params.winsize, warp_radius,
                update_mats=i < params.iterations - 1,
                update_fn=update_fn,
                use_pallas_solve=kernel_mode.startswith("pallas"),
            )
    if out_layout == "planes":
        return flow[..., 0], flow[..., 1]  # [H, W, B] planes
    return flow.transpose(2, 0, 1, 3)  # [B, H, W, 2]
