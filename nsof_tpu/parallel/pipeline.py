"""Pipeline (pp) parallelism: GPipe-style microbatch pipelining over a
'stage' mesh axis.

The reference has no pipeline parallelism (its only multi-device
construct is thread-based ``nn.DataParallel``, codebase/RAFT/train.py:138);
this module is the TPU-native pipelining layer that completes the
dp/tp/sp/pp sharding surface of ``nsof_tpu.parallel``.

Scheme (classic GPipe on an SPMD mesh): every device owns ONE stage's
parameters (the 'stage'-sharded leading axis of ``stage_params``); the
program runs ``M + S - 1`` synchronous ticks; at tick ``t`` stage ``s``
processes microbatch ``m = t - s`` (a bubble when ``m`` is out of range)
and hands its activation to stage ``s+1`` over ICI with one
non-wrapping ``lax.ppermute``.  Utilization is ``M / (M + S - 1)`` — the
standard pipeline bubble; pick ``M >= 4*S`` for >80%.

Per-microbatch side inputs that every stage needs read-only (e.g. a
correlation pyramid) ride in ``micro_consts``: they are indexed locally
by ``m`` on each device instead of being shipped through the pipeline,
so ICI traffic is just the recurrent activation.

The flagship use is RAFT's weight-tied refinement loop
(core/raft.py:123-140): 8/8-split GRU iterations across stages turn the
deepest serial part of the model into a pipeline while encoders/corr
stay data-parallel — see :func:`make_raft_pp_flow`.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

Array = jnp.ndarray
PyTree = Any


def _take(tree: PyTree, i) -> PyTree:
    return jax.tree_util.tree_map(
        lambda x: lax.dynamic_index_in_dim(x, i, 0, keepdims=False), tree
    )


def pipeline_stages(
    mesh: Mesh,
    stage_fn: Callable[[PyTree, PyTree, PyTree], PyTree],
    stage_params: PyTree,
    micro_inputs: PyTree,
    micro_consts: PyTree = None,
    axis: str = "stage",
) -> PyTree:
    """Run ``S = mesh.shape[axis]`` stages over ``M`` microbatches.

    Args:
        stage_fn: ``(params_s, const_m, act) -> act`` — must return the
            SAME pytree structure/shapes/dtypes as ``act`` (the activation
            is the pipeline's recurrent carry).
        stage_params: pytree whose leaves have leading dim ``S`` (stage
            ``s`` gets slice ``s``); pass :func:`tied_stage_params` for
            weight-tied loops.
        micro_inputs: pytree with leading dim ``M`` — microbatch ``m``'s
            initial activation (shapes below the leading dim must match
            the activation).
        micro_consts: optional pytree with leading dim ``M`` of
            read-only per-microbatch side inputs, replicated to every
            stage and indexed locally (never sent over ICI).

    Returns the final activations, leading dim ``M``, replicated on all
    devices of the axis — numerically the sequential composition
    ``stage_{S-1}(... stage_0(micro_inputs[m]))`` for each ``m``.
    """
    S = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(micro_inputs)
    if not leaves:
        raise ValueError("micro_inputs must be a non-empty pytree")
    M = leaves[0].shape[0]
    if micro_consts is None:
        micro_consts = ()

    def body(params, inputs, consts):
        # local slice: leading stage dim is 1 on each device
        params = jax.tree_util.tree_map(lambda x: x[0], params)
        s = lax.axis_index(axis)

        zero_act = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x[0]), inputs
        )
        out_buf = jax.tree_util.tree_map(jnp.zeros_like, inputs)

        def tick(t, carry):
            recv, out = carry
            m = t - s
            m_c = jnp.clip(m, 0, M - 1)
            inj = _take(inputs, m_c)
            act_in = jax.tree_util.tree_map(
                lambda a, b: jnp.where(s == 0, a, b), inj, recv
            )
            act_out = stage_fn(params, _take(consts, m_c), act_in)
            write = (m >= 0) & (m < M) & (s == S - 1)

            def upd(buf, a):
                cur = lax.dynamic_index_in_dim(buf, m_c, 0, keepdims=False)
                return lax.dynamic_update_index_in_dim(
                    buf, jnp.where(write, a, cur), m_c, 0
                )

            out = jax.tree_util.tree_map(upd, out, act_out)
            if S > 1:
                perm = [(i, i + 1) for i in range(S - 1)]
                sent = jax.tree_util.tree_map(
                    lambda a: lax.ppermute(a, axis, perm), act_out
                )
            else:
                sent = act_out
            return sent, out

        _, out = lax.fori_loop(0, M + S - 1, tick, (zero_act, out_buf))
        # only the last stage's buffer holds results; replicate it
        out = jax.tree_util.tree_map(
            lambda x: jnp.where(s == S - 1, x, jnp.zeros_like(x)), out
        )
        return lax.psum(out, axis)

    specs = jax.tree_util.tree_map(lambda _: P(axis), stage_params)
    rep_in = jax.tree_util.tree_map(lambda _: P(), micro_inputs)
    rep_c = jax.tree_util.tree_map(lambda _: P(), micro_consts)
    rep_out = jax.tree_util.tree_map(lambda _: P(), micro_inputs)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(specs, rep_in, rep_c),
        out_specs=rep_out,
        check_rep=False,
    )(stage_params, micro_inputs, micro_consts)


def tied_stage_params(params: PyTree, n_stages: int) -> PyTree:
    """Stack one parameter set ``n_stages`` times along a new leading
    (stage-sharded) axis — each device materializes only its own copy
    once the 'stage' sharding is applied.  For weight-tied pipelines
    (RAFT's update block runs identical weights every iteration)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_stages,) + x.shape), params
    )


# ── RAFT: iterations-as-stages pipeline ──────────────────────────────────


def make_raft_pp_flow(
    mesh: Mesh,
    cfg=None,
    iters: int | None = None,
    axis: str = "stage",
):
    """Pipeline-parallel RAFT inference: the GRU refinement loop
    (core/raft.py:123-140) split into ``S`` stages of ``iters/S``
    iterations each, microbatches of image pairs flowing through.

    Encoders + all-pairs correlation (the batch-friendly prologue) run
    replicated across the axis; only the recurrent activation
    ``(net, coords1)`` crosses ICI.  The per-microbatch corr pyramid and
    context features ride ``micro_consts`` (local indexing, no ICI).

    Returns ``fn(variables, image1, image2) -> flow_up`` with
    ``image*: [M, B, H, W, 3]`` (M microbatches) and
    ``flow_up: [M, B, H, W, 2]`` — matching the unsharded
    ``RAFT(cfg).apply(..., test_mode=True)[1]`` per microbatch.

    Weight-tied stages mean pp here buys latency hiding across
    microbatches (every chip busy on a different microbatch's
    iterations), not parameter-memory scaling; for the parameter-sharded
    axis use tp (``shard_params_conv_tp``).
    """
    from nsof_tpu.models.raft import (
        BasicEncoder,
        BasicUpdateBlock,
        RaftConfig,
        SmallEncoder,
        SmallUpdateBlock,
        all_pairs_correlation,
        build_corr_pyramid,
        coords_grid,
        corr_lookup,
        upflow8,
        upsample_flow_convex,
    )

    cfg = cfg or RaftConfig()
    if cfg.corr_mode == "alternate":
        raise NotImplementedError(
            "pp pipeline uses the all-pairs corr pyramid as a microbatch "
            "constant; corr_mode='alternate' is not supported here"
        )
    S = mesh.shape[axis]
    iters = iters or cfg.iters
    if iters % S != 0:
        raise ValueError(f"iters ({iters}) must divide by stages ({S})")
    k = iters // S
    dt = cfg.compute_dtype
    hdim, cdim = cfg.hidden_dim, cfg.context_dim

    if cfg.small:
        fnet = SmallEncoder(128, "instance", dt)
        cnet = SmallEncoder(hdim + cdim, "none", dt)
        update = SmallUpdateBlock(cfg)
    else:
        fnet = BasicEncoder(256, "instance", dt)
        cnet = BasicEncoder(hdim + cdim, cfg.cnet_norm, dt)
        update = BasicUpdateBlock(cfg)

    def stage_fn(uparams, const, act):
        net, coords1 = act["net"], act["coords1"]
        coords0, inp = const["coords0"], const["inp"]
        pyramid = const["pyramid"]
        up_mask = act.get("up_mask")
        for _ in range(k):
            corr_feat = corr_lookup(list(pyramid), coords1, cfg.corr_radius)
            flow = (coords1 - coords0).astype(dt)
            net, mask, delta = update.apply(
                {"params": uparams}, net, inp, corr_feat.astype(dt), flow
            )
            coords1 = coords1 + delta.astype(jnp.float32)
            if mask is not None:
                up_mask = mask.astype(jnp.float32)
        out = {"net": net, "coords1": coords1}
        if up_mask is not None:
            out["up_mask"] = up_mask
        return out

    def fn(variables, image1, image2):
        p = variables["params"]
        m, b, h, w, _ = image1.shape
        flat1 = image1.reshape(m * b, h, w, 3)
        flat2 = image2.reshape(m * b, h, w, 3)
        img1 = (2.0 * (flat1.astype(jnp.float32) / 255.0) - 1.0).astype(dt)
        img2 = (2.0 * (flat2.astype(jnp.float32) / 255.0) - 1.0).astype(dt)

        fmap1 = fnet.apply({"params": p["fnet"]}, img1).astype(jnp.float32)
        fmap2 = fnet.apply({"params": p["fnet"]}, img2).astype(jnp.float32)
        corr = all_pairs_correlation(fmap1, fmap2)
        # pyramid levels are [(M*B)*h8*w8, hl, wl, 1]; split out M so a
        # _take slice is exactly the [B*h8*w8, ...] layout corr_lookup eats
        pyramid = tuple(
            c.reshape((m, c.shape[0] // m) + c.shape[1:])
            for c in build_corr_pyramid(corr, cfg.corr_levels)
        )
        cmap = cnet.apply({"params": p["cnet"]}, img1)
        net = jnp.tanh(cmap[..., :hdim])
        inp = jax.nn.relu(cmap[..., hdim:])

        _, h8, w8, _ = fmap1.shape
        coords = coords_grid(m * b, h8, w8).reshape(m, b, h8, w8, 2)
        act = {
            "net": net.reshape(m, b, h8, w8, hdim),
            "coords1": coords,
        }
        if not cfg.small:
            act["up_mask"] = jnp.zeros((m, b, h8, w8, 64 * 9), jnp.float32)
        consts = {
            "coords0": coords,
            "inp": inp.reshape(m, b, h8, w8, cdim),
            "pyramid": pyramid,
        }
        stage_params = tied_stage_params(p["update_block"], S)
        out = pipeline_stages(
            mesh, stage_fn, stage_params, act, consts, axis=axis
        )
        flow8 = out["coords1"] - coords
        if cfg.small:
            up = jax.vmap(upflow8)(flow8)
        else:
            up = jax.vmap(upsample_flow_convex)(flow8, out["up_mask"])
        return up

    return jax.jit(fn)
