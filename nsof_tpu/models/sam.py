"""Segment Anything (SAM) in Flax — the native promptable segmenter
behind the GT-mask tooling.

The reference vendors Meta's segment-anything for its ground-truth mask
generation chain (codebase/lang-segment-anything/segment_anything/,
driven by lang_sam/lang_sam.py:105-115 with box prompts,
multimask_output=False).  This module is a from-scratch TPU-native
implementation of the same capability: the ViTDet image encoder
(windowed attention + decomposed relative positions), the prompt
encoder (random-Fourier positional encoding, point/box/mask prompts),
and the two-way-transformer mask decoder with hypernetwork mask heads —
plus a converter from the official ``sam_vit_{b,l,h}.pth`` checkpoints
(build_sam.py:37-52 registry shapes).

TPU-first design notes:

- NHWC everywhere; ``LayerNorm2d`` (channel-only LN on NCHW maps,
  common.py:31-43) becomes a plain last-axis LayerNorm.
- Windowed attention is a static reshape: pad 64x64 tokens to 70x70,
  fold 14x14 windows into the batch axis, one batched attention — no
  dynamic shapes, every matmul lands on the MXU.
- Decomposed relative-position bias uses static numpy index tables
  (shapes are compile-time constants) so the gathers fold into cheap
  takes; tables stored at a different resolution are linearly resized
  at trace time (get_rel_pos, image_encoder.py:292-322 semantics).
- The 2x2-stride-2 transposed convs in the decoder's upscaler are
  implemented as an einsum + pixel-shuffle reshape — exactly torch's
  ConvTranspose2d arithmetic, but expressed as one MXU matmul.
- Everything is jittable with static prompt counts; the predictor
  compiles one decoder program per distinct prompt batch shape (the
  decoder is tiny — recompiles are milliseconds).

Numerical cares: torch ``nn.GELU`` is the exact erf form
(approximate=False here); encoder LayerNorms use eps=1e-6
(build_sam.py:72) while decoder LayerNorms use torch's default 1e-5.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)
MASK_THRESHOLD = 0.0


@dataclasses.dataclass(frozen=True)
class SamConfig:
    """Architecture hyperparameters (build_sam.py:55-101)."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn_indexes: tuple[int, ...] = (2, 5, 8, 11)
    img_size: int = 1024
    patch_size: int = 16
    window_size: int = 14
    prompt_dim: int = 256
    mask_in_chans: int = 16
    num_multimask_outputs: int = 3
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    compute_dtype: Any = jnp.float32

    @property
    def embedding_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


#: Official checkpoint variants (build_sam.py:14-44).
SAM_CONFIGS: dict[str, SamConfig] = {
    "vit_b": SamConfig(768, 12, 12, (2, 5, 8, 11)),
    "vit_l": SamConfig(1024, 24, 16, (5, 11, 17, 23)),
    "vit_h": SamConfig(1280, 32, 16, (7, 15, 23, 31)),
}


def _gelu(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# image encoder (ViTDet backbone, image_encoder.py)
# ---------------------------------------------------------------------------


def _rel_pos_table(rel_pos: Array, q_size: int, k_size: int) -> Array:
    """Gather the [q, k, head_dim] relative-position table
    (get_rel_pos, image_encoder.py:292-322; q_size == k_size here)."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel, rel_pos.shape[1]), method="linear"
        )
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    idx = (q_coords - k_coords + (k_size - 1) * max(q_size / k_size, 1.0))
    return rel_pos[idx.astype(np.int32)]


class _EncoderAttention(nn.Module):
    """Multi-head attention with decomposed rel-pos bias
    (image_encoder.py:185-240, 325-361)."""

    dim: int
    num_heads: int
    input_size: tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each [B, N, heads, hd]
        q = q.transpose(0, 2, 1, 3)  # [B, heads, N, hd]
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqc,bhkc->bhqk", q * (hd**-0.5), k)

        rel_h = self.param(
            "rel_pos_h",
            nn.initializers.zeros,
            (2 * self.input_size[0] - 1, hd),
        )
        rel_w = self.param(
            "rel_pos_w",
            nn.initializers.zeros,
            (2 * self.input_size[1] - 1, hd),
        )
        Rh = _rel_pos_table(jnp.asarray(rel_h, attn.dtype), h, h)
        Rw = _rel_pos_table(jnp.asarray(rel_w, attn.dtype), w, w)
        r_q = q.reshape(b, self.num_heads, h, w, hd)
        bias_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
        bias_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
        attn = attn.reshape(b, self.num_heads, h, w, h, w)
        attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
        attn = attn.reshape(b, self.num_heads, h * w, h * w)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class _EncoderBlock(nn.Module):
    """Pre-LN transformer block; window attention folds 14x14 windows
    into the batch axis with static padding (image_encoder.py:119-182,
    243-289)."""

    dim: int
    num_heads: int
    window_size: int  # 0 = global
    input_size: tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if ws > 0:
            pad_h = (-h) % ws
            pad_w = (-w) % ws
            xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            hp, wp = h + pad_h, w + pad_w
            xw = xp.reshape(b, hp // ws, ws, wp // ws, ws, c)
            xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
            aw = _EncoderAttention(
                self.dim, self.num_heads, (ws, ws), self.dtype, name="attn"
            )(xw)
            aw = aw.reshape(b, hp // ws, wp // ws, ws, ws, c)
            aw = aw.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
            x = aw[:, :h, :w]
        else:
            x = _EncoderAttention(
                self.dim, self.num_heads, self.input_size, self.dtype,
                name="attn",
            )(x)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_lin1")(y)
        y = _gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_lin2")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    """Image → [B, S, S, prompt_dim] embedding, S = img_size/16
    (image_encoder.py:17-116; NHWC neck with last-axis LayerNorms)."""

    config: SamConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        dt = cfg.compute_dtype
        s = x.shape[1] // cfg.patch_size
        x = jnp.asarray(x, dt)
        x = nn.Conv(
            cfg.embed_dim,
            (cfg.patch_size, cfg.patch_size),
            (cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=dt,
            name="patch_embed",
        )(x)
        pos = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (1, cfg.embedding_size, cfg.embedding_size, cfg.embed_dim),
        )
        if pos.shape[1] != s:  # non-standard input size
            pos = jax.image.resize(
                pos, (1, s, s, cfg.embed_dim), method="bicubic"
            )
        x = x + jnp.asarray(pos, dt)
        for i in range(cfg.depth):
            x = _EncoderBlock(
                cfg.embed_dim,
                cfg.num_heads,
                0 if i in cfg.global_attn_indexes else cfg.window_size,
                (s, s),
                dt,
                name=f"block{i}",
            )(x)
        x = nn.Conv(
            cfg.prompt_dim, (1, 1), use_bias=False, dtype=dt, name="neck0"
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck1")(x)
        x = nn.Conv(
            cfg.prompt_dim,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=dt,
            name="neck2",
        )(x)
        return nn.LayerNorm(epsilon=1e-6, name="neck3")(x)


# ---------------------------------------------------------------------------
# prompt encoder (prompt_encoder.py)
# ---------------------------------------------------------------------------


class PromptEncoder(nn.Module):
    """Sparse (points/boxes) + dense (mask / no-mask) prompt embeddings
    (prompt_encoder.py:16-168).  Point labels: 1 = positive, 0 =
    negative, -1 = padding (PE zeroed, not_a_point embedding added)."""

    config: SamConfig

    def setup(self):
        cfg = self.config
        d = cfg.prompt_dim
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, d // 2)
        )
        self.point_embed = self.param(
            "point_embed", nn.initializers.normal(1.0), (4, d)
        )
        self.not_a_point = self.param(
            "not_a_point", nn.initializers.normal(1.0), (1, d)
        )
        self.no_mask = self.param(
            "no_mask", nn.initializers.normal(1.0), (1, d)
        )
        mc = cfg.mask_in_chans
        self.mask_conv1 = nn.Conv(mc // 4, (2, 2), (2, 2), padding="VALID",
                                  name="mask_conv1")
        self.mask_ln1 = nn.LayerNorm(epsilon=1e-6, name="mask_ln1")
        self.mask_conv2 = nn.Conv(mc, (2, 2), (2, 2), padding="VALID",
                                  name="mask_conv2")
        self.mask_ln2 = nn.LayerNorm(epsilon=1e-6, name="mask_ln2")
        self.mask_conv3 = nn.Conv(cfg.prompt_dim, (1, 1), name="mask_conv3")

    def _pe(self, coords01: Array) -> Array:
        """Random-Fourier PE of [0,1]-normalized coords
        (prompt_encoder.py:185-192)."""
        c = (2.0 * coords01 - 1.0) @ self.pe_gaussian
        c = (2.0 * np.pi) * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def dense_pe(self, h: int, w: int) -> Array:
        """[h, w, D] grid PE at pixel centers (get_dense_pe)."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            [jnp.tile(xs[None, :], (h, 1)), jnp.tile(ys[:, None], (1, w))],
            axis=-1,
        )
        return self._pe(grid)

    def embed_points(self, coords: Array, labels: Array) -> Array:
        """[B, P, 2] pixel coords (input frame) + [B, P] labels →
        [B, P, D]."""
        cfg = self.config
        size = jnp.asarray(
            [cfg.img_size, cfg.img_size], jnp.float32
        )
        pe = self._pe((coords + 0.5) / size)
        lab = labels[..., None]
        pe = jnp.where(lab == -1, 0.0, pe)
        pe = pe + jnp.where(lab == -1, self.not_a_point[0], 0.0)
        pe = pe + jnp.where(lab == 0, self.point_embed[0], 0.0)
        pe = pe + jnp.where(lab == 1, self.point_embed[1], 0.0)
        return pe

    def embed_boxes(self, boxes: Array) -> Array:
        """[B, 4] xyxy (input frame) → [B, 2, D] corner embeddings."""
        cfg = self.config
        corners = boxes.reshape(-1, 2, 2) + 0.5
        size = jnp.asarray([cfg.img_size, cfg.img_size], jnp.float32)
        pe = self._pe(corners / size)
        return pe + self.point_embed[2:4][None]

    def embed_mask(self, mask: Array) -> Array:
        """[B, 4S, 4S, 1] mask input → [B, S, S, D] dense embedding."""
        x = self.mask_conv1(mask)
        x = _gelu(self.mask_ln1(x))
        x = self.mask_conv2(x)
        x = _gelu(self.mask_ln2(x))
        return self.mask_conv3(x)

    def __call__(
        self,
        point_coords: Optional[Array],
        point_labels: Optional[Array],
        boxes: Optional[Array],
        mask_input: Optional[Array],
    ) -> tuple[Array, Array]:
        """Full prompt embedding (prompt_encoder.py:128-168): returns
        (sparse [B, N, D], dense [B, S, S, D]).  When points are given
        without boxes, a padding point is appended (label -1)."""
        cfg = self.config
        parts = []
        bs = 1
        if point_coords is not None:
            if boxes is None:
                pad_c = jnp.zeros(
                    (point_coords.shape[0], 1, 2), point_coords.dtype
                )
                pad_l = -jnp.ones(
                    (point_labels.shape[0], 1), point_labels.dtype
                )
                point_coords = jnp.concatenate([point_coords, pad_c], 1)
                point_labels = jnp.concatenate([point_labels, pad_l], 1)
            parts.append(self.embed_points(point_coords, point_labels))
            bs = point_coords.shape[0]
        if boxes is not None:
            parts.append(self.embed_boxes(boxes))
            bs = boxes.shape[0]
        sparse = (
            jnp.concatenate(parts, axis=1)
            if parts
            else jnp.zeros((bs, 0, cfg.prompt_dim))
        )
        s = cfg.embedding_size
        if mask_input is not None:
            dense = self.embed_mask(mask_input)
        else:
            dense = jnp.broadcast_to(
                self.no_mask[0], (bs, s, s, cfg.prompt_dim)
            )
        return sparse, dense


# ---------------------------------------------------------------------------
# mask decoder (transformer.py + mask_decoder.py)
# ---------------------------------------------------------------------------


class _DownAttention(nn.Module):
    """Attention with internal-dim downsampling (transformer.py:185-240)."""

    dim: int
    num_heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array) -> Array:
        inner = self.dim // self.downsample
        hd = inner // self.num_heads

        def heads(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(inner, name="q_proj")(q))
        k = heads(nn.Dense(inner, name="k_proj")(k))
        v = heads(nn.Dense(inner, name="v_proj")(v))
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, name="out_proj")(out)


class _TwoWayBlock(nn.Module):
    """Self-attn on tokens, cross token→image, MLP, cross image→token
    (transformer.py:109-182)."""

    dim: int
    num_heads: int
    mlp_dim: int
    skip_first_pe: bool

    @nn.compact
    def __call__(
        self, queries: Array, keys: Array, query_pe: Array, key_pe: Array
    ) -> tuple[Array, Array]:
        if self.skip_first_pe:
            queries = _DownAttention(
                self.dim, self.num_heads, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + _DownAttention(
                self.dim, self.num_heads, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + _DownAttention(
            self.dim, self.num_heads, 2, name="cross_t2i"
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        y = nn.Dense(self.mlp_dim, name="mlp_lin1")(queries)
        y = nn.Dense(self.dim, name="mlp_lin2")(nn.relu(y))
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries + y)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + _DownAttention(
            self.dim, self.num_heads, 2, name="cross_i2t"
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class _TwoWayTransformer(nn.Module):
    """(transformer.py:16-106)."""

    dim: int
    depth: int
    num_heads: int
    mlp_dim: int

    @nn.compact
    def __call__(
        self, image_emb: Array, image_pe: Array, tokens: Array
    ) -> tuple[Array, Array]:
        b, h, w, c = image_emb.shape
        keys = image_emb.reshape(b, h * w, c)
        key_pe = image_pe.reshape(1, h * w, c)
        key_pe = jnp.broadcast_to(key_pe, keys.shape)
        queries = tokens
        for i in range(self.depth):
            queries, keys = _TwoWayBlock(
                self.dim, self.num_heads, self.mlp_dim, i == 0,
                name=f"layer{i}",
            )(queries, keys, tokens, key_pe)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + _DownAttention(
            self.dim, self.num_heads, 2, name="final_attn"
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final")(queries)
        return queries, keys


def _conv_transpose2x(x: Array, kernel: Array, bias: Array) -> Array:
    """2x2-stride-2 ConvTranspose2d as einsum + pixel shuffle.

    ``kernel`` is [2, 2, C_in, C_out]; out[b, 2i+di, 2j+dj, o] =
    sum_c x[b,i,j,c] * kernel[di,dj,c,o] + bias[o] — torch's exact
    arithmetic (mask_decoder.py:53-58), one MXU matmul."""
    b, h, w, _ = x.shape
    o = kernel.shape[-1]
    y = jnp.einsum("bhwc,ijco->bhiwjo", x, kernel)
    return y.reshape(b, 2 * h, 2 * w, o) + bias


class _MLP(nn.Module):
    """relu MLP head (mask_decoder.py:154-176)."""

    hidden: int
    out: int
    layers: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f"lin{i}")(x))
        return nn.Dense(self.out, name=f"lin{self.layers - 1}")(x)


class MaskDecoder(nn.Module):
    """Prompt + image embeddings → (low-res mask logits, IoU scores)
    (mask_decoder.py:16-149)."""

    config: SamConfig

    @nn.compact
    def __call__(
        self,
        image_emb: Array,  # [1 or B, S, S, D] (broadcast over prompts)
        image_pe: Array,  # [S, S, D]
        sparse: Array,  # [B, N, D]
        dense: Array,  # [B, S, S, D]
    ) -> tuple[Array, Array]:
        cfg = self.config
        d = cfg.prompt_dim
        nm = cfg.num_mask_tokens
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, d)
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (nm, d)
        )
        b = sparse.shape[0]
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None], (b, nm + 1, d)), sparse],
            axis=1,
        )
        src = jnp.broadcast_to(image_emb, dense.shape) + dense
        hs, src = _TwoWayTransformer(
            d, cfg.decoder_depth, cfg.decoder_heads, cfg.decoder_mlp_dim,
            name="transformer",
        )(src, image_pe[None], tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1 : 1 + nm]

        s = cfg.embedding_size
        src = src.reshape(b, s, s, d)
        up1_k = self.param(
            "up1_kernel", nn.initializers.normal(0.02), (2, 2, d, d // 4)
        )
        up1_b = self.param("up1_bias", nn.initializers.zeros, (d // 4,))
        up2_k = self.param(
            "up2_kernel", nn.initializers.normal(0.02), (2, 2, d // 4, d // 8)
        )
        up2_b = self.param("up2_bias", nn.initializers.zeros, (d // 8,))
        x = _conv_transpose2x(src, up1_k, up1_b)
        x = _gelu(nn.LayerNorm(epsilon=1e-6, name="up_ln")(x))
        x = _gelu(_conv_transpose2x(x, up2_k, up2_b))  # [B, 4S, 4S, D/8]

        hyper = jnp.stack(
            [
                _MLP(d, d // 8, 3, name=f"hyper{i}")(mask_out[:, i])
                for i in range(nm)
            ],
            axis=1,
        )  # [B, nm, D/8]
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, x)
        iou_pred = _MLP(256, nm, 3, name="iou_head")(iou_out)
        return masks, iou_pred


# ---------------------------------------------------------------------------
# checkpoint conversion (official segment-anything state_dict → Flax)
# ---------------------------------------------------------------------------


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear weight [out, in] → Dense kernel [in, out]."""
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _conv(state: Mapping[str, np.ndarray], prefix: str, bias=True) -> dict:
    out = {
        "kernel": np.asarray(
            state[f"{prefix}.weight"], np.float32
        ).transpose(2, 3, 1, 0)
    }
    if bias:
        out["bias"] = np.asarray(state[f"{prefix}.bias"], np.float32)
    return out


def _ln(state: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {
        "scale": np.asarray(state[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(state[f"{prefix}.bias"], np.float32),
    }


def _attn(state: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {
        name: {
            "kernel": _t(state[f"{prefix}.{name}.weight"]),
            "bias": np.asarray(state[f"{prefix}.{name}.bias"], np.float32),
        }
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }


def infer_sam_config(state: Mapping[str, np.ndarray]) -> SamConfig:
    """Detect vit_b/l/h from the encoder embed width
    (build_sam.py:14-44)."""
    dim = int(np.asarray(
        state["image_encoder.patch_embed.proj.weight"]
    ).shape[0])
    for cfg in SAM_CONFIGS.values():
        if cfg.embed_dim == dim:
            return cfg
    raise ValueError(f"unknown SAM encoder width {dim}")


def convert_sam(
    state: Mapping[str, np.ndarray], config: Optional[SamConfig] = None
) -> tuple[SamConfig, dict]:
    """Official ``sam_vit_*.pth`` state_dict → Flax params for
    (:class:`ImageEncoderViT`, :class:`PromptEncoder`,
    :class:`MaskDecoder`).  Missing tensors raise KeyError (no silent
    partial loads)."""
    cfg = config or infer_sam_config(state)

    enc: dict[str, Any] = {
        "patch_embed": _conv(state, "image_encoder.patch_embed.proj"),
        "pos_embed": np.asarray(
            state["image_encoder.pos_embed"], np.float32
        ),
        "neck0": _conv(state, "image_encoder.neck.0", bias=False),
        "neck1": _ln(state, "image_encoder.neck.1"),
        "neck2": _conv(state, "image_encoder.neck.2", bias=False),
        "neck3": _ln(state, "image_encoder.neck.3"),
    }
    for i in range(cfg.depth):
        p = f"image_encoder.blocks.{i}"
        enc[f"block{i}"] = {
            "norm1": _ln(state, f"{p}.norm1"),
            "norm2": _ln(state, f"{p}.norm2"),
            "attn": {
                "qkv": {
                    "kernel": _t(state[f"{p}.attn.qkv.weight"]),
                    "bias": np.asarray(
                        state[f"{p}.attn.qkv.bias"], np.float32
                    ),
                },
                "proj": {
                    "kernel": _t(state[f"{p}.attn.proj.weight"]),
                    "bias": np.asarray(
                        state[f"{p}.attn.proj.bias"], np.float32
                    ),
                },
                "rel_pos_h": np.asarray(
                    state[f"{p}.attn.rel_pos_h"], np.float32
                ),
                "rel_pos_w": np.asarray(
                    state[f"{p}.attn.rel_pos_w"], np.float32
                ),
            },
            "mlp_lin1": {
                "kernel": _t(state[f"{p}.mlp.lin1.weight"]),
                "bias": np.asarray(state[f"{p}.mlp.lin1.bias"], np.float32),
            },
            "mlp_lin2": {
                "kernel": _t(state[f"{p}.mlp.lin2.weight"]),
                "bias": np.asarray(state[f"{p}.mlp.lin2.bias"], np.float32),
            },
        }

    pe = "prompt_encoder"
    prompt = {
        "pe_gaussian": np.asarray(
            state[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"],
            np.float32,
        ),
        "point_embed": np.concatenate(
            [
                np.asarray(
                    state[f"{pe}.point_embeddings.{i}.weight"], np.float32
                )
                for i in range(4)
            ],
            axis=0,
        ),
        "not_a_point": np.asarray(
            state[f"{pe}.not_a_point_embed.weight"], np.float32
        ),
        "no_mask": np.asarray(
            state[f"{pe}.no_mask_embed.weight"], np.float32
        ),
        "mask_conv1": _conv(state, f"{pe}.mask_downscaling.0"),
        "mask_ln1": _ln(state, f"{pe}.mask_downscaling.1"),
        "mask_conv2": _conv(state, f"{pe}.mask_downscaling.3"),
        "mask_ln2": _ln(state, f"{pe}.mask_downscaling.4"),
        "mask_conv3": _conv(state, f"{pe}.mask_downscaling.6"),
    }

    md = "mask_decoder"
    dec: dict[str, Any] = {
        "iou_token": np.asarray(state[f"{md}.iou_token.weight"], np.float32),
        "mask_tokens": np.asarray(
            state[f"{md}.mask_tokens.weight"], np.float32
        ),
        # ConvTranspose2d weight [C_in, C_out, kh, kw] → [kh, kw, Ci, Co]
        "up1_kernel": np.asarray(
            state[f"{md}.output_upscaling.0.weight"], np.float32
        ).transpose(2, 3, 0, 1),
        "up1_bias": np.asarray(
            state[f"{md}.output_upscaling.0.bias"], np.float32
        ),
        "up_ln": _ln(state, f"{md}.output_upscaling.1"),
        "up2_kernel": np.asarray(
            state[f"{md}.output_upscaling.3.weight"], np.float32
        ).transpose(2, 3, 0, 1),
        "up2_bias": np.asarray(
            state[f"{md}.output_upscaling.3.bias"], np.float32
        ),
    }
    tr: dict[str, Any] = {
        "final_attn": _attn(state, f"{md}.transformer.final_attn_token_to_image"),
        "norm_final": _ln(state, f"{md}.transformer.norm_final_attn"),
    }
    for i in range(cfg.decoder_depth):
        p = f"{md}.transformer.layers.{i}"
        tr[f"layer{i}"] = {
            "self_attn": _attn(state, f"{p}.self_attn"),
            "cross_t2i": _attn(state, f"{p}.cross_attn_token_to_image"),
            "cross_i2t": _attn(state, f"{p}.cross_attn_image_to_token"),
            "norm1": _ln(state, f"{p}.norm1"),
            "norm2": _ln(state, f"{p}.norm2"),
            "norm3": _ln(state, f"{p}.norm3"),
            "norm4": _ln(state, f"{p}.norm4"),
            "mlp_lin1": {
                "kernel": _t(state[f"{p}.mlp.lin1.weight"]),
                "bias": np.asarray(state[f"{p}.mlp.lin1.bias"], np.float32),
            },
            "mlp_lin2": {
                "kernel": _t(state[f"{p}.mlp.lin2.weight"]),
                "bias": np.asarray(state[f"{p}.mlp.lin2.bias"], np.float32),
            },
        }
    dec["transformer"] = tr
    for i in range(cfg.num_mask_tokens):
        p = f"{md}.output_hypernetworks_mlps.{i}"
        dec[f"hyper{i}"] = {
            f"lin{j}": {
                "kernel": _t(state[f"{p}.layers.{j}.weight"]),
                "bias": np.asarray(
                    state[f"{p}.layers.{j}.bias"], np.float32
                ),
            }
            for j in range(3)
        }
    dec["iou_head"] = {
        f"lin{j}": {
            "kernel": _t(state[f"{md}.iou_prediction_head.layers.{j}.weight"]),
            "bias": np.asarray(
                state[f"{md}.iou_prediction_head.layers.{j}.bias"],
                np.float32,
            ),
        }
        for j in range(3)
    }

    params = {
        "image_encoder": {"params": enc},
        "prompt_encoder": {"params": prompt},
        "mask_decoder": {"params": dec},
    }
    return cfg, jax.tree.map(jnp.asarray, params)


def load_sam_checkpoint(path: str) -> tuple[SamConfig, dict]:
    """Build (config, params) from an official ``sam_vit_*.pth``
    (torch used only for deserialisation)."""
    from nsof_tpu.models.convert import load_torch_state_dict

    return convert_sam(load_torch_state_dict(path))


# ---------------------------------------------------------------------------
# predictor (the SamPredictor capability, predictor.py + sam.py:133-174)
# ---------------------------------------------------------------------------


def preprocess_shape(h: int, w: int, target: int) -> tuple[int, int]:
    """Longest side → target (transforms.py get_preprocess_shape)."""
    scale = target / max(h, w)
    return int(h * scale + 0.5), int(w * scale + 0.5)


class SamPredictor:
    """Image-at-a-time promptable segmentation.

    ``set_image`` resizes the longest side to ``img_size`` (cv2 bilinear
    — the reference uses PIL bilinear; sub-pixel resampling difference,
    documented divergence), normalizes, zero-pads to a square, and runs
    the jitted encoder once.  ``predict`` embeds box/point prompts,
    decodes, and upsamples logits back to the original frame
    (sam.py:133-162).  Decoder programs are compiled per distinct
    prompt-batch shape."""

    def __init__(self, config: SamConfig, params: Mapping[str, Any]):
        self.config = config
        self.params = params
        self.encoder = ImageEncoderViT(config)
        self.prompt_encoder = PromptEncoder(config)
        self.decoder = MaskDecoder(config)
        self._embedding = None
        self._input_size = None
        self._orig_size = None
        self._encode = jax.jit(
            lambda p, x: self.encoder.apply(p["image_encoder"], x)
        )

        def _decode(p, emb, coords, labels, boxes, mask_input, multimask):
            sparse, dense = self.prompt_encoder.apply(
                p["prompt_encoder"], coords, labels, boxes, mask_input
            )
            s = self.config.embedding_size
            image_pe = self.prompt_encoder.apply(
                p["prompt_encoder"], s, s, method=PromptEncoder.dense_pe
            )
            masks, iou = self.decoder.apply(
                p["mask_decoder"], emb, image_pe, sparse, dense
            )
            sl = slice(1, None) if multimask else slice(0, 1)
            return masks[:, sl], iou[:, sl]

        self._decode = jax.jit(_decode, static_argnums=(6,))

    def set_image(self, image_rgb: np.ndarray) -> None:
        import cv2

        h0, w0 = image_rgb.shape[:2]
        tgt = self.config.img_size
        nh, nw = preprocess_shape(h0, w0, tgt)
        resized = cv2.resize(
            image_rgb, (nw, nh), interpolation=cv2.INTER_LINEAR
        ).astype(np.float32)
        x = (resized - np.asarray(PIXEL_MEAN, np.float32)) / np.asarray(
            PIXEL_STD, np.float32
        )
        canvas = np.zeros((tgt, tgt, 3), np.float32)
        canvas[:nh, :nw] = x
        self._embedding = self._encode(self.params, canvas[None])
        self._input_size = (nh, nw)
        self._orig_size = (h0, w0)

    def _transform_coords(self, coords: np.ndarray) -> np.ndarray:
        h0, w0 = self._orig_size
        nh, nw = self._input_size
        out = np.asarray(coords, np.float32).copy()
        out[..., 0] *= nw / w0
        out[..., 1] *= nh / h0
        return out

    def predict(
        self,
        boxes: Optional[np.ndarray] = None,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        mask_input: Optional[np.ndarray] = None,
        multimask_output: bool = False,
        return_logits: bool = False,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Prompts in ORIGINAL image coordinates → (masks [B, C, H0, W0]
        bool (or float logits), iou [B, C], low-res logits
        [B, C, 4S, 4S])."""
        if self._embedding is None:
            raise RuntimeError("call set_image first")
        coords = labels = bxs = m_in = None
        if point_coords is not None:
            coords = jnp.asarray(
                self._transform_coords(point_coords), jnp.float32
            )
            labels = jnp.asarray(point_labels, jnp.int32)
        if boxes is not None:
            bxs = jnp.asarray(
                self._transform_coords(
                    np.asarray(boxes, np.float32).reshape(-1, 2, 2)
                ).reshape(-1, 4),
                jnp.float32,
            )
        if mask_input is not None:
            m_in = jnp.asarray(mask_input, jnp.float32)
        low_res, iou = self._decode(
            self.params, self._embedding, coords, labels, bxs, m_in,
            bool(multimask_output),
        )
        masks = self.postprocess(low_res)
        if not return_logits:
            masks = masks > MASK_THRESHOLD
        return (
            np.asarray(masks),
            np.asarray(iou),
            np.asarray(low_res),
        )

    def postprocess(self, low_res: Array) -> Array:
        """Low-res logits → original-size logits (sam.py:133-162:
        bilinear to img_size, crop the un-padded region, bilinear to the
        original size — half-pixel sampling == align_corners=False)."""
        b, c = low_res.shape[:2]
        tgt = self.config.img_size
        up = jax.image.resize(
            low_res, (b, c, tgt, tgt), method="linear"
        )
        nh, nw = self._input_size
        h0, w0 = self._orig_size
        up = up[:, :, :nh, :nw]
        return jax.image.resize(up, (b, c, h0, w0), method="linear")


# ---------------------------------------------------------------------------
# synthetic state_dict (weightless structural/parity fixture)
# ---------------------------------------------------------------------------

#: Small-but-faithful architecture for tests: same graph, tiny dims.
TINY_SAM = SamConfig(
    embed_dim=32,
    depth=3,
    num_heads=4,
    global_attn_indexes=(1,),
    img_size=128,
    patch_size=16,
    window_size=4,
    prompt_dim=64,
    mask_in_chans=8,
    decoder_mlp_dim=128,
)


def synthetic_sam_state_dict(
    config: SamConfig = TINY_SAM, seed: int = 0
) -> dict[str, np.ndarray]:
    """Random state_dict with the exact official-checkpoint key/shape
    schema for ``config`` (the SA weights are not redistributable; the
    parity tests drive the reference torch modules from this same
    dict)."""
    rng = np.random.default_rng(seed)
    out: dict[str, np.ndarray] = {}

    def add(key, *shape, zero=False):
        out[key] = (
            np.zeros(shape, np.float32)
            if zero
            else rng.normal(0, 0.05, shape).astype(np.float32)
        )

    cfg = config
    d, pd = cfg.embed_dim, cfg.prompt_dim
    s = cfg.embedding_size
    add("image_encoder.patch_embed.proj.weight", d, 3,
        cfg.patch_size, cfg.patch_size)
    add("image_encoder.patch_embed.proj.bias", d)
    add("image_encoder.pos_embed", 1, s, s, d)
    hd = d // cfg.num_heads
    for i in range(cfg.depth):
        p = f"image_encoder.blocks.{i}"
        add(f"{p}.norm1.weight", d)
        add(f"{p}.norm1.bias", d)
        add(f"{p}.norm2.weight", d)
        add(f"{p}.norm2.bias", d)
        add(f"{p}.attn.qkv.weight", 3 * d, d)
        add(f"{p}.attn.qkv.bias", 3 * d)
        add(f"{p}.attn.proj.weight", d, d)
        add(f"{p}.attn.proj.bias", d)
        size = s if i in cfg.global_attn_indexes else cfg.window_size
        add(f"{p}.attn.rel_pos_h", 2 * size - 1, hd)
        add(f"{p}.attn.rel_pos_w", 2 * size - 1, hd)
        add(f"{p}.mlp.lin1.weight", 4 * d, d)
        add(f"{p}.mlp.lin1.bias", 4 * d)
        add(f"{p}.mlp.lin2.weight", d, 4 * d)
        add(f"{p}.mlp.lin2.bias", d)
    add("image_encoder.neck.0.weight", pd, d, 1, 1)
    add("image_encoder.neck.1.weight", pd)
    add("image_encoder.neck.1.bias", pd)
    add("image_encoder.neck.2.weight", pd, pd, 3, 3)
    add("image_encoder.neck.3.weight", pd)
    add("image_encoder.neck.3.bias", pd)

    pe = "prompt_encoder"
    add(f"{pe}.pe_layer.positional_encoding_gaussian_matrix", 2, pd // 2)
    for i in range(4):
        add(f"{pe}.point_embeddings.{i}.weight", 1, pd)
    add(f"{pe}.not_a_point_embed.weight", 1, pd)
    add(f"{pe}.no_mask_embed.weight", 1, pd)
    mc = cfg.mask_in_chans
    add(f"{pe}.mask_downscaling.0.weight", mc // 4, 1, 2, 2)
    add(f"{pe}.mask_downscaling.0.bias", mc // 4)
    add(f"{pe}.mask_downscaling.1.weight", mc // 4)
    add(f"{pe}.mask_downscaling.1.bias", mc // 4)
    add(f"{pe}.mask_downscaling.3.weight", mc, mc // 4, 2, 2)
    add(f"{pe}.mask_downscaling.3.bias", mc)
    add(f"{pe}.mask_downscaling.4.weight", mc)
    add(f"{pe}.mask_downscaling.4.bias", mc)
    add(f"{pe}.mask_downscaling.6.weight", pd, mc, 1, 1)
    add(f"{pe}.mask_downscaling.6.bias", pd)

    md = "mask_decoder"
    nm = cfg.num_mask_tokens
    add(f"{md}.iou_token.weight", 1, pd)
    add(f"{md}.mask_tokens.weight", nm, pd)
    for i in range(cfg.decoder_depth):
        p = f"{md}.transformer.layers.{i}"
        for a, ds in (
            ("self_attn", 1),
            ("cross_attn_token_to_image", 2),
            ("cross_attn_image_to_token", 2),
        ):
            inner = pd // ds
            for nmn in ("q_proj", "k_proj", "v_proj"):
                add(f"{p}.{a}.{nmn}.weight", inner, pd)
                add(f"{p}.{a}.{nmn}.bias", inner)
            add(f"{p}.{a}.out_proj.weight", pd, inner)
            add(f"{p}.{a}.out_proj.bias", pd)
        for j in range(1, 5):
            add(f"{p}.norm{j}.weight", pd)
            add(f"{p}.norm{j}.bias", pd)
        add(f"{p}.mlp.lin1.weight", cfg.decoder_mlp_dim, pd)
        add(f"{p}.mlp.lin1.bias", cfg.decoder_mlp_dim)
        add(f"{p}.mlp.lin2.weight", pd, cfg.decoder_mlp_dim)
        add(f"{p}.mlp.lin2.bias", pd)
    fp = f"{md}.transformer.final_attn_token_to_image"
    for nmn in ("q_proj", "k_proj", "v_proj"):
        add(f"{fp}.{nmn}.weight", pd // 2, pd)
        add(f"{fp}.{nmn}.bias", pd // 2)
    add(f"{fp}.out_proj.weight", pd, pd // 2)
    add(f"{fp}.out_proj.bias", pd)
    add(f"{md}.transformer.norm_final_attn.weight", pd)
    add(f"{md}.transformer.norm_final_attn.bias", pd)
    add(f"{md}.output_upscaling.0.weight", pd, pd // 4, 2, 2)
    add(f"{md}.output_upscaling.0.bias", pd // 4)
    add(f"{md}.output_upscaling.1.weight", pd // 4)
    add(f"{md}.output_upscaling.1.bias", pd // 4)
    add(f"{md}.output_upscaling.3.weight", pd // 4, pd // 8, 2, 2)
    add(f"{md}.output_upscaling.3.bias", pd // 8)
    for i in range(nm):
        p = f"{md}.output_hypernetworks_mlps.{i}"
        add(f"{p}.layers.0.weight", pd, pd)
        add(f"{p}.layers.0.bias", pd)
        add(f"{p}.layers.1.weight", pd, pd)
        add(f"{p}.layers.1.bias", pd)
        add(f"{p}.layers.2.weight", pd // 8, pd)
        add(f"{p}.layers.2.bias", pd // 8)
    add(f"{md}.iou_prediction_head.layers.0.weight", 256, pd)
    add(f"{md}.iou_prediction_head.layers.0.bias", 256)
    add(f"{md}.iou_prediction_head.layers.1.weight", 256, 256)
    add(f"{md}.iou_prediction_head.layers.1.bias", 256)
    add(f"{md}.iou_prediction_head.layers.2.weight", nm, 256)
    add(f"{md}.iou_prediction_head.layers.2.bias", nm)
    return out
