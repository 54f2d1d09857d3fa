"""FlowFormer memory encoder: cost volume → latent cost tokens.

Re-design of MemoryEncoder + CostPerceiverEncoder (codebase/
FlowFormer-Official/core/FlowFormer/LatentCostFormer/encoder.py:336-367 /
:240-305): per source pixel, the H2×W2 cost map is patch-embedded to 8×
tokens with linear-sine positional encodings, cross-attended into K=8
latent tokens, then alternately refined by intra-cost self-attention and
"vertical" attention across source pixels (local ws=7 + global
sub-sampled, conditioned on context features via vert_c_dim).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from einops import rearrange

from nsof_tpu.models.flowformer.config import FlowFormerConfig
from nsof_tpu.models.flowformer.twins import Mlp

Array = jnp.ndarray


def linear_position_embedding(coords: Array, dim: int) -> Array:
    """LinearPositionEmbeddingSine (attention.py:150-154): sin/cos ramps of
    π·coord·k/200 for k = 0..dim/4-1; coords [..., 2] as (x, y)."""
    freqs = jnp.arange(dim // 4, dtype=jnp.float32) / 200.0
    x = coords[..., 0:1] * freqs
    y = coords[..., 1:2] * freqs
    pi = 3.14
    return jnp.concatenate(
        [jnp.sin(pi * x), jnp.cos(pi * x), jnp.sin(pi * y), jnp.cos(pi * y)],
        axis=-1,
    )


class MultiHeadAttention(nn.Module):
    """Plain MHA over provided q/k/v projections (attention.py:37-62)."""

    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        q = rearrange(q, "b i (h d) -> b h i d", h=self.heads)
        k = rearrange(k, "b j (h d) -> b h j d", h=self.heads)
        v = rearrange(v, "b j (h d) -> b h j d", h=self.heads)
        scale = (self.dim / self.heads) ** -0.5
        attn = jnp.einsum(
            "bhid,bhjd->bhij", q * scale, k,
            preferred_element_type=jnp.float32,
        )
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        return rearrange(out, "b h i d -> b i (h d)")


class CostPatchEmbed(nn.Module):
    """Patch-embed a cost map to 1/8 tokens with coordinate FFN
    (encoder.py PatchEmbed, patch_size=8)."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cost):  # [N, H2, W2, heads]
        n, h2, w2, _ = cost.shape
        pad_b = (-h2) % 8
        pad_r = (-w2) % 8
        x = jnp.pad(cost, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        d = self.embed_dim
        x = nn.Conv(d // 4, (6, 6), strides=2, padding=2, dtype=self.dtype,
                    name="proj0")(x)
        x = nn.relu(x)
        x = nn.Conv(d // 2, (6, 6), strides=2, padding=2, dtype=self.dtype,
                    name="proj1")(x)
        x = nn.relu(x)
        x = nn.Conv(d, (6, 6), strides=2, padding=2, dtype=self.dtype,
                    name="proj2")(x)
        h3, w3 = x.shape[1:3]

        ys = jnp.arange(h3, dtype=jnp.float32) * 8.0 + 4.0
        xs = jnp.arange(w3, dtype=jnp.float32) * 8.0 + 4.0
        coords = jnp.stack(
            jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
        )  # [h3, w3, 2]
        pe = linear_position_embedding(coords, d)
        pe = jnp.broadcast_to(pe[None], (n, h3, w3, d))
        x = jnp.concatenate([x, pe.astype(x.dtype)], axis=-1)
        x = nn.Conv(2 * d, (1, 1), dtype=self.dtype, name="ffn0")(x)
        x = nn.relu(x)
        x = nn.Conv(2 * d, (1, 1), dtype=self.dtype, name="ffn1")(x)
        x = x.reshape(n, h3 * w3, 2 * d)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="norm")(x), (h3, w3)


class CrossAttentionLayer(nn.Module):
    """Latents attend into target tokens (encoder.py:316-334 layout)."""

    query_dim: int
    target_dim: int
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, target):
        short_cut = query
        qn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(query)
        q = nn.Dense(self.query_dim, dtype=self.dtype, name="q")(qn)
        k = nn.Dense(self.query_dim, dtype=self.dtype, name="k")(target)
        v = nn.Dense(self.query_dim, dtype=self.dtype, name="v")(target)
        x = MultiHeadAttention(self.query_dim, self.heads, self.dtype,
                               name="attn")(q, k, v)
        x = nn.Dense(self.query_dim, dtype=self.dtype, name="proj")(x)
        x = short_cut + x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return x + Mlp(self.query_dim, self.query_dim, self.dtype,
                       name="ffn")(y)


class SelfAttentionLayer(nn.Module):
    dim: int
    heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        short_cut = x
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(xn)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(xn)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(xn)
        y = MultiHeadAttention(self.dim, self.heads, self.dtype,
                               name="attn")(q, k, v)
        y = nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)
        x = short_cut + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return x + Mlp(self.dim, self.dim, self.dtype, name="ffn")(z)


class VerticalAttentionLayer(nn.Module):
    """Attention across source pixels per latent token: local window block
    followed by a global sub-sampled block, both context-conditioned
    (VerticalSelfAttentionLayer, encoder.py:108-135 → twins Block with
    with_rpe=True, vert_c_dim>0, i.e. LocallyGroupedAttnRPEContext /
    GlobalSubSampleAttnRPEContext, twins.py:229-393).

    Reference-exact details: each block has its OWN 256→vert_c_dim context
    projection; q/k consume concat(x, ctx) + LinearPositionEmbeddingSine
    (within-window ws×ws coords for the local block, padded-grid coords
    for the global q, sr-scaled subsampled coords for the global k); the
    global block normalizes BOTH the sr_key and sr_value conv outputs with
    the SAME LayerNorm (twins.py:368-372); all norms are torch-default
    eps=1e-5 except the Block norms (default LayerNorm, also 1e-5 here —
    the vertical Blocks are built without timm's 1e-6 partial,
    encoder.py:125-127).

    Known reference quirk NOT reproduced: for batch>1 the torch code tiles
    the context k-major (`context.repeat(B//ctx, ...)`) while the latent
    tokens are laid out b-major — misaligning context and tokens.  We pair
    them correctly (b-major), which is identical at B=1 (the reference's
    eval batch size)."""

    dim: int
    vert_c_dim: int
    heads: int = 8
    ws: int = 7
    sr_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # x: [B*K, H1, W1, D]; context: [B, H1, W1, 256]
        bk, h1, w1, d = x.shape
        b = context.shape[0]
        d_qk = d + self.vert_c_dim

        def grid_pe(h, w, scale=1.0, dim=d_qk):
            xs = jnp.arange(w, dtype=jnp.float32) * scale
            ys = jnp.arange(h, dtype=jnp.float32) * scale
            coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
            return linear_position_embedding(coords, dim)

        def local_block(x, name):
            ctx = nn.Dense(self.vert_c_dim, dtype=self.dtype,
                           name=f"{name}_ctx")(context)
            ctx = jnp.repeat(ctx, bk // b, axis=0)
            xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name=f"{name}_norm1")(x)
            x_qk = jnp.concatenate([xn, ctx.astype(xn.dtype)], axis=-1)
            ws = self.ws
            pad_b = (-h1) % ws
            pad_r = (-w1) % ws
            pads = ((0, 0), (0, pad_b), (0, pad_r), (0, 0))
            xq = jnp.pad(x_qk, pads)
            xv = jnp.pad(xn, pads)
            # within-window RPE (twins.py:285-289): LPE of the ws×ws
            # coords, same for every window — tile across the padded grid
            pe = grid_pe(ws, ws)
            pe = jnp.tile(pe, ((h1 + pad_b) // ws, (w1 + pad_r) // ws, 1))
            xq = xq + pe[None].astype(xq.dtype)
            q = nn.Dense(d, dtype=self.dtype, name=f"{name}_q")(xq)
            k = nn.Dense(d, dtype=self.dtype, name=f"{name}_k")(xq)
            v = nn.Dense(d, dtype=self.dtype, name=f"{name}_v")(xv)

            def win(t):
                return rearrange(
                    t, "b (nh wa) (nw wb) (h dd) -> (b nh nw) h (wa wb) dd",
                    wa=ws, wb=ws, h=self.heads,
                )

            scale = (d // self.heads) ** -0.5
            attn = jnp.einsum(
                "bhid,bhjd->bhij", win(q) * scale, win(k),
                preferred_element_type=jnp.float32,
            )
            attn = nn.softmax(attn, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", attn, win(v))
            out = rearrange(
                out,
                "(b nh nw) h (wa wb) dd -> b (nh wa) (nw wb) (h dd)",
                b=bk, nh=(h1 + pad_b) // ws, wa=ws,
            )[:, :h1, :w1]
            out = nn.Dense(d, dtype=self.dtype, name=f"{name}_proj")(out)
            x = x + out
            z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"{name}_norm2")(x)
            return x + Mlp(4 * d, d, self.dtype, name=f"{name}_mlp")(z)

        def global_block(x, name):
            ctx = nn.Dense(self.vert_c_dim, dtype=self.dtype,
                           name=f"{name}_ctx")(context)
            ctx = jnp.repeat(ctx, bk // b, axis=0)
            xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name=f"{name}_norm1")(x)
            x_qk = jnp.concatenate([xn, ctx.astype(xn.dtype)], axis=-1)
            sr = self.sr_ratio
            pad_b = (-h1) % sr
            pad_r = (-w1) % sr
            hp, wp = h1 + pad_b, w1 + pad_r
            xk = jnp.pad(x_qk, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            xv = jnp.pad(xn, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            # q: full padded-grid RPE at dim C_qk (twins.py:358-364)
            q_in = xk + grid_pe(hp, wp)[None].astype(xk.dtype)
            q = nn.Dense(d, dtype=self.dtype, name=f"{name}_q")(q_in)
            ks = nn.Conv(d, (sr, sr), strides=sr, dtype=self.dtype,
                         name=f"{name}_srk")(xk)
            vs = nn.Conv(d, (sr, sr), strides=sr, dtype=self.dtype,
                         name=f"{name}_srv")(xv)
            # ONE shared LayerNorm on both conv outputs (twins.py:368-372)
            srnorm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name=f"{name}_srnorm")
            ks = srnorm(ks)
            vs = srnorm(vs)
            # k: subsampled-grid RPE, coords × sr, dim C (twins.py:374-378)
            ks = ks + grid_pe(hp // sr, wp // sr, scale=float(sr),
                              dim=d)[None].astype(ks.dtype)
            k = nn.Dense(d, dtype=self.dtype, name=f"{name}_k")(ks)
            v = nn.Dense(d, dtype=self.dtype, name=f"{name}_v")(vs)
            q2 = rearrange(q, "b x y (h dd) -> b h (x y) dd", h=self.heads)
            k2 = rearrange(k, "b x y (h dd) -> b h (x y) dd", h=self.heads)
            v2 = rearrange(v, "b x y (h dd) -> b h (x y) dd", h=self.heads)
            scale = (d // self.heads) ** -0.5
            attn = jnp.einsum(
                "bhid,bhjd->bhij", q2 * scale, k2,
                preferred_element_type=jnp.float32,
            )
            attn = nn.softmax(attn, axis=-1).astype(v2.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v2)
            out = rearrange(out, "b h (x y) dd -> b x y (h dd)", x=hp)
            out = out[:, :h1, :w1]
            out = nn.Dense(d, dtype=self.dtype, name=f"{name}_proj")(out)
            x = x + out
            z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"{name}_norm2")(x)
            return x + Mlp(4 * d, d, self.dtype, name=f"{name}_mlp")(z)

        x = local_block(x, "local")
        x = global_block(x, "global")
        return x


class CostPerceiverEncoder(nn.Module):
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, cost_volume, context):
        """cost_volume [B, H1, W1, heads, H2, W2]; context [B, H1, W1, 256].

        Returns (cost_memory [B*H1*W1, K, D], (h3, w3))."""
        c = self.cfg
        dt = c.compute_dtype
        b, h1, w1, heads, h2, w2 = cost_volume.shape
        cost_maps = cost_volume.reshape(b * h1 * w1, heads, h2, w2)
        cost_maps = jnp.moveaxis(cost_maps, 1, -1)  # [N, H2, W2, heads]

        x, size3 = CostPatchEmbed(c.cost_latent_input_dim, dt,
                                  name="patch_embed")(cost_maps)

        latents = self.param(
            "latent_tokens",
            nn.initializers.normal(1.0),
            (1, c.cost_latent_token_num, c.cost_latent_dim),
        ).astype(dt)
        latents = jnp.broadcast_to(
            latents, (x.shape[0],) + latents.shape[1:]
        )
        x = CrossAttentionLayer(
            c.cost_latent_dim, 2 * c.cost_latent_input_dim, dtype=dt,
            name="input_layer",
        )(latents, x)

        short_cut = x
        k = c.cost_latent_token_num
        for idx in range(c.encoder_depth):
            x = SelfAttentionLayer(c.cost_latent_dim, dtype=dt,
                                   name=f"self{idx}")(x)
            # [B*H1*W1, K, D] → [B*K, H1, W1, D] for vertical attention
            x = rearrange(x, "(b h1 w1) k d -> (b k) h1 w1 d",
                          b=b, h1=h1, w1=w1)
            x = VerticalAttentionLayer(
                c.cost_latent_dim, c.vert_c_dim, dtype=dt,
                name=f"vert{idx}",
            )(x, context)
            x = rearrange(x, "(b k) h1 w1 d -> (b h1 w1) k d", b=b, k=k)
        if c.cost_encoder_res:
            x = x + short_cut
        return x, size3, cost_maps


class MemoryEncoder(nn.Module):
    cfg: FlowFormerConfig

    @nn.compact
    def __call__(self, feat_s, feat_t, context):
        """feat_s/feat_t [B, H1, W1, C] 1/8-res features; context
        [B, H1, W1, 256].  Returns (cost_memory, size3, cost_maps)."""
        c = self.cfg
        dt = c.compute_dtype
        convertor = nn.Conv(c.encoder_latent_dim, (1, 1), use_bias=False,
                            dtype=dt, name="channel_convertor")
        feat_s = convertor(feat_s)
        feat_t = convertor(feat_t)
        b, h1, w1, ch = feat_s.shape
        heads = c.cost_heads_num
        f1 = feat_s.reshape(b, h1 * w1, heads, ch // heads)
        f2 = feat_t.reshape(b, h1 * w1, heads, ch // heads)
        # NB: FlowFormer does NOT scale by 1/sqrt(d) (encoder.py:341-352)
        cost = jnp.einsum(
            "bihd,bjhd->bhij", f1, f2, preferred_element_type=jnp.float32
        )
        cost_volume = cost.reshape(b, heads, h1, w1, h1, w1)
        cost_volume = jnp.moveaxis(cost_volume, 1, 3)
        return CostPerceiverEncoder(c, name="cost_perceiver")(
            cost_volume, context
        )
