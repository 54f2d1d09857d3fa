"""FlowFormer memory decoder: recurrent flow queries over cost memory.

Re-design of MemoryDecoder (codebase/FlowFormer-Official/core/FlowFormer/
LatentCostFormer/decoder.py:146-260): per refinement step, a 9×9 local
cost window is sampled at the current coords (encode_flow_token, r=4), a
flow-token query cross-attends into the latent cost memory, and a
GMA-augmented SepConvGRU updates hidden state and flow, with convex 8×
upsampling.  The default depth is 32 (things_eval.py:52).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from nsof_tpu.models.flowformer.config import FlowFormerConfig
from nsof_tpu.models.flowformer.encoder import (
    MultiHeadAttention,
    linear_position_embedding,
)
from nsof_tpu.models.flowformer.twins import Mlp
from nsof_tpu.models.raft import (
    SepConvGRU,
    FlowHead,
    coords_grid,
    corr_lookup,
    upsample_flow_convex,
)

Array = jnp.ndarray


class GMAAttention(nn.Module):
    """Global motion aggregation attention map from context features
    (gma.py Attention; content-only branch, 1 head, dim_head 128)."""

    dim: int = 128
    heads: int = 1
    dim_head: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fmap):  # [B, H, W, C]
        b, h, w, _ = fmap.shape
        qk = nn.Conv(2 * self.heads * self.dim_head, (1, 1), use_bias=False,
                     dtype=self.dtype, name="to_qk")(fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        q = rearrange(q, "b x y (h d) -> b h (x y) d", h=self.heads)
        k = rearrange(k, "b x y (h d) -> b h (x y) d", h=self.heads)
        scale = self.dim_head**-0.5
        sim = jnp.einsum(
            "bhid,bhjd->bhij", q * scale, k,
            preferred_element_type=jnp.float32,
        )
        return nn.softmax(sim, axis=-1)


class GMAAggregate(nn.Module):
    """Aggregate motion features with the attention map (gma.py Aggregate)."""

    dim: int = 128
    heads: int = 1
    dim_head: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, attn, fmap):  # attn [B, h, N, N]; fmap [B, H, W, C]
        b, h, w, _ = fmap.shape
        v = nn.Conv(self.heads * self.dim_head, (1, 1), use_bias=False,
                    dtype=self.dtype, name="to_v")(fmap)
        v = rearrange(v, "b x y (h d) -> b h (x y) d", h=self.heads)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", x=h)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return fmap + gamma.astype(fmap.dtype) * out


class FFMotionEncoder(nn.Module):
    """Motion encoder over (global+local) cost and flow (gru.py
    BasicMotionEncoder: cor_planes = 81 + query_latent_dim)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        dt = self.dtype
        cor = nn.relu(nn.Conv(256, (1, 1), name="convc1", dtype=dt)(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), name="convc2", dtype=dt)(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), name="convf1", dtype=dt)(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), name="convf2", dtype=dt)(flo))
        out = nn.relu(
            nn.Conv(126, (3, 3), name="conv", dtype=dt)(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class GMAUpdateBlock(nn.Module):
    """SepConvGRU update with GMA-aggregated motion features
    (gru.py GMAUpdateBlock)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow, attention):
        dt = self.dtype
        motion = FFMotionEncoder(dt, name="encoder")(flow, corr)
        motion_global = GMAAggregate(dtype=dt, name="aggregator")(
            attention, motion
        )
        x = jnp.concatenate([inp, motion, motion_global], axis=-1)
        net = SepConvGRU(128, dtype=dt, name="gru")(net, x)
        delta = FlowHead(256, dtype=dt, name="flow_head")(net)
        mask = nn.Sequential(
            [nn.Conv(256, (3, 3), dtype=dt), nn.relu,
             nn.Conv(64 * 9, (1, 1), dtype=dt)],
            name="mask",
        )(net)
        return net, 0.25 * mask, delta


class DecoderCrossAttention(nn.Module):
    """Flow-token query → cost-memory cross attention with positional
    query encoding (decoder.py CrossAttentionLayer)."""

    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, query, key, value, coords1):
        c = self.cfg
        dt = c.compute_dtype
        dim = c.query_latent_dim
        b, h1, w1, _ = coords1.shape
        qc = coords1.reshape(b * h1 * w1, 1, 2)
        qc_enc = linear_position_embedding(qc, dim).astype(dt)

        short_cut = query
        qn = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm1")(query)
        if c.add_flow_token:
            q = nn.Dense(dim, dtype=dt, name="q")(qn + qc_enc)
        else:
            q = nn.Dense(dim, dtype=dt, name="q")(qc_enc)
        x = MultiHeadAttention(dim, 8, dt, name="attn")(q, key, value)
        x = nn.Dense(dim, dtype=dt, name="proj")(
            jnp.concatenate([x, short_cut], axis=-1)
        )
        x = short_cut + x
        y = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm2")(x)
        return x + Mlp(dim, dim, dt, name="ffn")(y)


class MemoryDecoder(nn.Module):
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, cost_memory, context, cost_maps, flow_init=None,
                 test_mode: bool = False):
        """cost_memory [B*H1*W1, K, D]; context [B, H1, W1, 256];
        cost_maps [B*H1*W1, H2, W2, heads].

        Returns the list of per-step upsampled flows, or just the final
        flow when ``test_mode`` (no [depth, B, H, W, 2] stack on device).
        """
        c = self.cfg
        dt = c.compute_dtype
        b, h1, w1, _ = context.shape

        context = nn.Conv(256, (1, 1), dtype=dt, name="proj")(context)
        net = jnp.tanh(context[..., :128])
        inp = nn.relu(context[..., 128:])
        attention = None
        if c.use_gma:
            attention = GMAAttention(dtype=dt, name="att")(inp)

        coords0 = coords_grid(b, h1, w1)
        coords1 = coords_grid(b, h1, w1)
        if flow_init is not None:
            coords1 = coords1 + flow_init

        # cost_maps as a [B*H1*W1, 1, H2, W2, heads]-style pyramid source
        # for the r=4 window lookup (decoder.py encode_flow_token)
        cm = cost_maps  # [B*H1*W1, H2, W2, heads]

        key = nn.Dense(c.query_latent_dim, dtype=dt, name="mem_k")(
            cost_memory
        )
        value = nn.Dense(c.query_latent_dim, dtype=dt, name="mem_v")(
            cost_memory
        )

        # Recurrent refinement as ONE lax.scan over the decoder depth
        # (shared params via nn.scan variable_broadcast).  The reference's
        # unrolled Python loop (decoder.py:126-160) would inline the GMA
        # update block depth=32 times into the HLO, blowing up XLA compile
        # time.  In test mode only the final flow is carried.
        def step(mdl, carry, _):
            net, coords1, _ = carry
            coords1 = jax.lax.stop_gradient(coords1)
            cost_forward = corr_lookup([cm], coords1, 4)  # [B, H1, W1, 81]
            # flow-token encoder: 81·heads cost window → query_latent_dim
            # (decoder.py:157-161: Conv(81·heads→dim)→GELU→Conv(dim→dim))
            query = nn.Sequential(
                [nn.Conv(c.query_latent_dim, (1, 1), dtype=dt),
                 lambda x: nn.gelu(x, approximate=False),
                 nn.Conv(c.query_latent_dim, (1, 1), dtype=dt)],
                name="flow_token_encoder", parent=mdl,
            )(cost_forward)
            query = query.reshape(b * h1 * w1, 1, c.query_latent_dim)
            cost_global = DecoderCrossAttention(
                c, name="decoder_layer", parent=mdl
            )(query, key, value, coords1)
            cost_global = cost_global.reshape(b, h1, w1, c.query_latent_dim)
            if c.only_global:
                corr = cost_global
            else:
                corr = jnp.concatenate([cost_global, cost_forward], axis=-1)
            flow = (coords1 - coords0).astype(dt)
            net, up_mask, delta = GMAUpdateBlock(
                dt, name="update_block", parent=mdl
            )(net, inp, corr.astype(dt), flow, attention)
            coords1 = coords1 + delta.astype(jnp.float32)
            flow_up = upsample_flow_convex(
                coords1 - coords0, up_mask.astype(jnp.float32)
            )
            return (net, coords1, flow_up), (None if test_mode else flow_up)

        flow0 = jnp.zeros((b, h1 * 8, w1 * 8, 2), jnp.float32)
        body = nn.remat(step, prevent_cse=False) if c.remat else step
        (net, coords1, flow_up), stacked = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=c.decoder_depth,
        )(self, (net, coords1, flow0), None)

        if test_mode:
            return flow_up
        return [stacked[i] for i in range(c.decoder_depth)]
