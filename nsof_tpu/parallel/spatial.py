"""Spatial (sp) parallelism: full-frame dense flow sharded over image
rows with halo exchange on ICI.

The reference's only spatial decomposition is FlowFormer's host-side
tiled inference (visualize_flow.py:27-100).  On a TPU mesh the natural
equivalent is to shard the image's row dimension across chips and run
the stencil computation on overlap tiles: every device holds its row
slab plus ``halo`` rows from each neighbour (one ``lax.ppermute``
exchange per side — pure ICI traffic), computes dense Farnebäck flow on
the extended slab entirely locally, and keeps its own rows.  One
collective pair up front, zero collectives in the compute — the classic
halo/overlap-tile pattern, sized so the redundant compute fraction is
``2*halo / slab_rows``.

Accuracy contract (mirrors the fast-path contract in
ops/farneback_fast.py): a shard-owned row is exact w.r.t. the unsharded
flow when the full receptive field of the pyramid (blur + polynomial +
iterations x (winsize/2 + displacement), scaled by (1/pyr_scale)^levels)
fits inside ``halo``; the first/last shard's true image border band uses
a reflected halo instead of cv2's border rule (the same border band the
exact op already documents as cv2-self-inconsistent).  ``halo`` and the
per-shard row count should be multiples of 2**levels so pyramid
decimation grids align between the sharded and unsharded runs
(pyr_scale=0.5 presets); tests/test_parallel_spatial.py measures the
agreement on a virtual 8-device mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from nsof_tpu.ops.farneback import FarnebackParams, farneback

Array = jnp.ndarray


def halo_exchange_rows(x: Array, halo: int, axis_name: str, n: int) -> Array:
    """[Hs, W] local slab → [Hs + 2*halo, W] with neighbour rows.

    Interior shards receive their neighbours' edge rows via two
    ``ppermute`` shifts; the first/last shard fill the missing side with
    a local reflection (BORDER_REFLECT_101 of the slab edge)."""
    if halo <= 0:
        return x
    if x.shape[0] <= halo:
        raise ValueError(
            f"per-shard rows ({x.shape[0]}) must exceed halo ({halo}); "
            "use fewer shards or a smaller receptive field"
        )
    send_up = x[:halo]  # my top rows → neighbour above's bottom halo
    send_down = x[-halo:]  # my bottom rows → neighbour below's top halo
    from_above = lax.ppermute(
        send_down, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_below = lax.ppermute(
        send_up, axis_name, [(i, i - 1) for i in range(1, n)]
    )
    idx = lax.axis_index(axis_name)
    reflect_top = x[1 : halo + 1][::-1]
    reflect_bot = x[-halo - 1 : -1][::-1]
    top = jnp.where(idx == 0, reflect_top, from_above)
    bot = jnp.where(idx == n - 1, reflect_bot, from_below)
    return jnp.concatenate([top, x, bot], axis=0)


def suggested_halo(params: FarnebackParams, max_disp: float = 8.0) -> int:
    """Receptive-field bound for one flow computation, rounded up to a
    multiple of 2**levels (pyramid grid alignment)."""
    sigma0 = (1.0 / params.pyr_scale - 1.0) * 0.5
    blur_r = max(int(sigma0 * 5) // 2, 1)
    per_level = (
        blur_r
        + params.poly_n // 2
        + params.iterations * (params.winsize // 2 + max_disp)
    )
    reach = per_level * (1.0 / params.pyr_scale) ** params.levels
    unit = 2**params.levels
    return int(-(-reach // unit)) * unit


def make_spatial_flow(
    mesh: Mesh,
    params: FarnebackParams = FarnebackParams(),
    halo: int | None = None,
    axis: str = "space",
):
    """Returns a jitted fn(prev [H, W], next [H, W]) → flow [H, W, 2]
    with H sharded over the mesh's ``axis``.

    H must divide by the axis size; per-shard rows and ``halo`` should
    be multiples of 2**levels.  Each device computes flow for its slab
    plus ``halo`` context rows and keeps the slab — displacement
    vectors are coordinate-free, so the concatenated result is the
    full-frame flow."""
    n = mesh.shape[axis]
    r = suggested_halo(params) if halo is None else halo

    def local(prev: Array, nxt: Array) -> Array:
        pe = halo_exchange_rows(prev, r, axis, n)
        ne = halo_exchange_rows(nxt, r, axis, n)
        flow = farneback(pe, ne, params)
        return flow[r : flow.shape[0] - r] if r else flow

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None, None),
        check_rep=False,
    )
    return jax.jit(fn)


def make_spatial_flow_batch(
    mesh: Mesh,
    params: FarnebackParams = FarnebackParams(),
    halo: int | None = None,
    space_axis: str = "space",
    data_axis: str | None = "data",
):
    """2-D sp x dp decomposition: fn(prev [B, H, W], next [B, H, W]) →
    flow [B, H, W, 2] with the batch sharded over ``data_axis`` and rows
    over ``space_axis`` — the layout for serving large-frame streams on
    a pod slice (batch rides the outer mesh dimension, halos ride the
    inner/fast ICI dimension)."""
    n = mesh.shape[space_axis]
    r = suggested_halo(params) if halo is None else halo

    def local(prev: Array, nxt: Array) -> Array:
        def one(a, b):
            pe = halo_exchange_rows(a, r, space_axis, n)
            ne = halo_exchange_rows(b, r, space_axis, n)
            flow = farneback(pe, ne, params)
            return flow[r : flow.shape[0] - r] if r else flow

        return jax.vmap(one)(prev, nxt)

    if data_axis is None:
        in_spec = P(None, space_axis, None)
        out_spec = P(None, space_axis, None, None)
    else:
        in_spec = P(data_axis, space_axis, None)
        out_spec = P(data_axis, space_axis, None, None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(in_spec, in_spec),
        out_specs=out_spec,
        check_rep=False,
    )
    return jax.jit(fn)
