"""Twins-SVT backbone (first two stages) in Flax.

FlowFormer's feature and context encoders are the first two stages of
timm's ``twins_svt_large`` (codebase/FlowFormer-Official/core/FlowFormer/
encoders.py:6-35): patch-embed 4× → 2 blocks @128ch/4heads → patch-embed
2× → 2 blocks @256ch/8heads, giving 256-dim features at 1/8 resolution.
Each stage alternates a locally-grouped window attention (LSA, ws=7) and a
global sub-sampled attention (GSA, sr_ratio 8/4), with a PEG positional
depthwise conv after the first block (Twins: arXiv:2104.13840).

NHWC Flax implementation; window padding handled with zero pads exactly as
the reference's forward_padding path (twins.py:415-455).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from einops import rearrange

Array = jnp.ndarray


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU (erf)
        return nn.Dense(self.out, dtype=self.dtype)(x)


class LocallyGroupedAttn(nn.Module):
    """LSA: full attention within non-overlapping ws×ws windows."""

    dim: int
    num_heads: int
    ws: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        b, h, w, c = x.shape
        ws = self.ws
        pad_b = (-h) % ws
        pad_r = (-w) % ws
        xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(xp)
        qkv = rearrange(
            qkv,
            "b (nh ws1) (nw ws2) (three hd d) -> three (b nh nw) hd (ws1 ws2) d",
            ws1=ws, ws2=ws, three=3, hd=self.num_heads,
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = (self.dim // self.num_heads) ** -0.5
        attn = jnp.einsum(
            "bhid,bhjd->bhij", q * scale, k,
            preferred_element_type=jnp.float32,
        )
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(
            out,
            "(b nh nw) hd (ws1 ws2) d -> b (nh ws1) (nw ws2) (hd d)",
            b=b, nh=hp // ws, ws1=ws,
        )
        out = out[:, :h, :w]
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class GlobalSubSampleAttn(nn.Module):
    """GSA: queries attend to a sr_ratio-subsampled key/value summary."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                self.dim,
                (self.sr_ratio, self.sr_ratio),
                strides=self.sr_ratio,
                dtype=self.dtype,
                name="sr",
            )(x)
            kv_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="sr_norm")(kv_in)
        else:
            kv_in = x
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(kv_in)

        q = rearrange(q, "b x y (h d) -> b h (x y) d", h=self.num_heads)
        k = rearrange(k, "b x y (h d) -> b h (x y) d", h=self.num_heads)
        v = rearrange(v, "b x y (h d) -> b h (x y) d", h=self.num_heads)
        scale = (self.dim // self.num_heads) ** -0.5
        attn = jnp.einsum(
            "bhid,bhjd->bhij", q * scale, k,
            preferred_element_type=jnp.float32,
        )
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h (x y) d -> b x y (h d)", x=h)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TwinsBlock(nn.Module):
    dim: int
    num_heads: int
    ws: int  # ws > 1 → LSA; ws == 1 → GSA
    sr_ratio: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.ws == 1:
            attn = GlobalSubSampleAttn(
                self.dim, self.num_heads, self.sr_ratio, self.dtype,
                name="attn",
            )
        else:
            attn = LocallyGroupedAttn(
                self.dim, self.num_heads, self.ws, self.dtype, name="attn"
            )
        x = x + attn(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                  name="norm1")(x))
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(self.dim * self.mlp_ratio, self.dim, self.dtype,
                    name="mlp")(y)
        return x


class PosConv(nn.Module):
    """PEG positional encoding: residual depthwise 3×3 conv
    (twins.py PosConv)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim, (3, 3), feature_group_count=self.dim,
            dtype=self.dtype, name="proj",
        )(x)
        return x + y


class TwinsSVTStage(nn.Module):
    dim: int
    num_heads: int
    depth: int
    patch: int
    sr_ratio: int
    ws: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.dim, (self.patch, self.patch), strides=self.patch,
                    dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="patch_norm")(x)
        for j in range(self.depth):
            ws = self.ws if j % 2 == 0 else 1  # alternate LSA / GSA
            x = TwinsBlock(self.dim, self.num_heads, ws, self.sr_ratio,
                           dtype=self.dtype, name=f"block{j}")(x)
            if j == 0:
                x = PosConv(self.dim, self.dtype, name="peg")(x)
        return x


class TwinsSVTLarge2Stage(nn.Module):
    """First two stages of Twins-SVT-large: [B, H, W, 3] → [B, H/8, W/8,
    256] (dims 128→256, heads 4→8, sr 8→4, depths 2+2)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TwinsSVTStage(128, 4, 2, patch=4, sr_ratio=8, dtype=self.dtype,
                          name="stage1")(x)
        x = TwinsSVTStage(256, 8, 2, patch=2, sr_ratio=4, dtype=self.dtype,
                          name="stage2")(x)
        return x
