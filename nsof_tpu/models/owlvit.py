"""OWL-ViT in Flax — native open-vocabulary text→box grounding.

The reference grounds text prompts to boxes with GroundingDINO inside
LangSAM (codebase/lang-segment-anything/lang_sam/lang_sam.py:91-103:
``predict_dino`` → thresholded boxes) before SAM turns the boxes into
masks.  This module is a from-scratch TPU-native open-vocabulary
detector of the same capability class — OWL-ViT (Minderer et al. 2022):
a CLIP dual tower whose patch tokens become detection queries via a
class-similarity head and a box-regression head — plus a converter
from the Hugging Face ``OwlViTForObjectDetection`` checkpoints
(e.g. ``google/owlvit-base-patch32``), so the grounding stage of the
GT-mask tooling runs natively on the chip instead of through torch.

TPU-first design notes:

- NHWC pixel input.  The patch embedding is expressed as one big MXU
  matmul over extracted (patch, patch, 3) tiles instead of a strided
  conv — identical arithmetic, better layout for the systolic array.
- Both towers share one pre-LayerNorm transformer block (quick-GELU
  MLPs, standard multi-head attention as batched einsums).  The text
  tower adds a causal mask plus the padding mask; both are static
  additive biases, so one compiled program serves every prompt.
- All shapes static: text is always the CLIP context of 16 tokens,
  queries are padded to a fixed count and masked out of the logits
  (the HF ``query_mask`` semantics: a query whose first token id is 0
  is padding).
- The grid box bias (the logit-space prior tying each patch token's
  box to its grid cell) is a compile-time numpy constant.

Numerical cares: tower MLPs use quick-GELU ``x·σ(1.702x)`` (HF config
``hidden_act='quick_gelu'``); the box head uses torch's exact erf GELU;
class-head normalisation adds 1e-6 to the norms while the text
projection normalises without eps — both reproduced exactly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "OwlVitConfig",
    "OwlVit",
    "TINY_OWLVIT",
    "convert_owlvit",
    "infer_owlvit_config",
    "post_process_detection",
]


@dataclasses.dataclass(frozen=True)
class OwlVitConfig:
    # vision tower
    image_size: int = 768
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_mlp: int = 3072
    # text tower
    vocab_size: int = 49408
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    text_mlp: int = 2048
    max_text_len: int = 16
    # joint
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    compute_dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


# Tiny configuration for structural / parity tests (no downloads).
TINY_OWLVIT = OwlVitConfig(
    image_size=64,
    patch_size=16,
    vision_width=32,
    vision_layers=2,
    vision_heads=2,
    vision_mlp=64,
    vocab_size=99,
    text_width=24,
    text_layers=2,
    text_heads=2,
    text_mlp=48,
    max_text_len=16,
    # HF's class head projects image features to the TEXT hidden size
    # (OwlViTClassPredictionHead out_dim), so projection_dim must equal
    # text_width — true of every published OWL-ViT checkpoint.
    projection_dim=24,
)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _Attention(nn.Module):
    """Standard multi-head attention with an optional additive bias."""

    width: int
    heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x, bias=None):
        B, L, _ = x.shape
        hd = self.width // self.heads
        dense = lambda name: nn.Dense(self.width, dtype=self.dtype, name=name)
        q = dense("q_proj")(x) * (hd ** -0.5)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)
        split = lambda t: t.reshape(B, L, self.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k))
        if bias is not None:
            logits = logits + bias
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        w = w.astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, split(v)).reshape(B, L, -1)
        return dense("out_proj")(out)


class _Block(nn.Module):
    """Pre-LN transformer block with a quick-GELU MLP."""

    width: int
    heads: int
    mlp: int
    eps: float
    dtype: Any

    @nn.compact
    def __call__(self, x, bias=None):
        ln = lambda name: nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name=name)
        x = x + _Attention(
            self.width, self.heads, self.dtype, name="self_attn"
        )(ln("layer_norm1")(x), bias)
        h = ln("layer_norm2")(x)
        h = nn.Dense(self.mlp, dtype=self.dtype, name="fc1")(h)
        h = _quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)
        return x + h


class _VisionTower(nn.Module):
    """CLIP ViT: patch matmul + class token + learned positions,
    pre-LN encoder, post-LN.  Returns the post-LN token sequence
    (class token first) — the detection heads consume all of it."""

    cfg: OwlVitConfig

    @nn.compact
    def __call__(self, pixel_values):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        B, H, W, _ = pixel_values.shape
        p, D = cfg.patch_size, cfg.vision_width
        h, w = H // p, W // p
        # (B,H,W,3) → (B, h·w, p·p·3) tiles ordered (ph, pw, c) — the
        # converter lays the torch conv weight out to match.
        x = pixel_values.reshape(B, h, p, w, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, h * w, p * p * 3)
        x = nn.Dense(D, use_bias=False, dtype=dt, name="patch_embed")(x)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (D,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (B, 1, D)), x], axis=1
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.grid * cfg.grid + 1, D),
        )
        x = x + pos.astype(dt)[None]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt, name="pre_layernorm")(x)
        for i in range(cfg.vision_layers):
            x = _Block(
                D, cfg.vision_heads, cfg.vision_mlp, cfg.layer_norm_eps, dt,
                name=f"layers_{i}",
            )(x)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dt, name="post_layernorm"
        )(x)


class _TextTower(nn.Module):
    """CLIP text transformer: token + position embeddings, causal
    pre-LN encoder, final LN, EOS-token pooling (argmax of ids — EOS is
    the highest token id in CLIP's vocabulary)."""

    cfg: OwlVitConfig

    @nn.compact
    def __call__(self, input_ids):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        N, L = input_ids.shape
        tok = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.text_width),
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_text_len, cfg.text_width),
        )
        x = jnp.take(tok.astype(dt), input_ids, axis=0) + pos.astype(dt)[None, :L]
        causal = jnp.triu(jnp.full((L, L), -1e9, dtype=jnp.float32), k=1)
        pad = jnp.where(input_ids > 0, 0.0, -1e9).astype(jnp.float32)
        bias = causal[None, None] + pad[:, None, None, :]
        for i in range(cfg.text_layers):
            x = _Block(
                cfg.text_width, cfg.text_heads, cfg.text_mlp,
                cfg.layer_norm_eps, dt, name=f"layers_{i}",
            )(x, bias)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dt, name="final_layer_norm"
        )(x)
        eos = jnp.argmax(input_ids, axis=-1)
        return x[jnp.arange(N), eos]


class OwlVit(nn.Module):
    """OWL-ViT open-vocabulary detector.

    ``pixel_values``: (B, H, W, 3) CLIP-normalised NHWC floats.
    ``input_ids``: (B, Q, L) tokenised text queries, 0-padded; a query
    whose first token is 0 is treated as padding (HF ``query_mask``).

    Returns ``logits`` (B, P, Q) per-patch per-query detection logits
    and ``pred_boxes`` (B, P, 4) normalised cxcywh — the exact outputs
    of HF ``OwlViTForObjectDetection`` (modeling_owlvit.py forward).
    """

    cfg: OwlVitConfig

    @nn.compact
    def __call__(self, pixel_values, input_ids):
        cfg, dt = self.cfg, self.cfg.compute_dtype
        B, Q, L = input_ids.shape
        tokens = _VisionTower(cfg, name="vision")(pixel_values)

        # Text queries → unit-norm projected embeddings.
        pooled = _TextTower(cfg, name="text")(input_ids.reshape(B * Q, L))
        query = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=dt, name="text_projection"
        )(pooled)
        query = query / jnp.linalg.norm(query, axis=-1, keepdims=True)
        query = query.reshape(B, Q, -1)

        # Patch tokens modulated by the class token, re-normalised.
        feats = tokens[:, 1:] * tokens[:, :1]
        feats = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dt, name="merged_layer_norm"
        )(feats)

        # Class head: cosine similarity with learned shift/scale.
        img_cls = nn.Dense(cfg.projection_dim, dtype=dt, name="class_dense0")(feats)
        img_cls_n = img_cls / (
            jnp.linalg.norm(img_cls, axis=-1, keepdims=True) + 1e-6
        )
        query_n = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-6)
        logits = jnp.einsum("bpd,bqd->bpq", img_cls_n, query_n)
        shift = nn.Dense(1, dtype=dt, name="logit_shift")(feats)
        scale = nn.Dense(1, dtype=dt, name="logit_scale")(feats)
        scale = jax.nn.elu(scale) + 1.0
        logits = (logits + shift) * scale
        query_valid = input_ids[:, :, 0] > 0
        logits = jnp.where(
            query_valid[:, None, :], logits, jnp.finfo(jnp.float32).min
        ).astype(jnp.float32)

        # Box head: 3-layer erf-GELU MLP + grid log-odds bias, sigmoid.
        h = nn.Dense(cfg.vision_width, dtype=dt, name="box_dense0")(feats)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.vision_width, dtype=dt, name="box_dense1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(4, dtype=dt, name="box_dense2")(h)
        boxes = jax.nn.sigmoid(
            h.astype(jnp.float32) + _box_bias(cfg.grid, cfg.grid)[None]
        )

        return {
            "logits": logits,
            "pred_boxes": boxes,
            "image_embeds": feats,
            "query_embeds": query,
        }


def _box_bias(gh: int, gw: int) -> jnp.ndarray:
    """Grid prior: each patch's box is biased (in logit space) to be
    centred on its cell with side = one cell (compute_box_bias,
    modeling_owlvit.py:1215-1235)."""
    xs = (np.arange(1, gw + 1, dtype=np.float32)) / gw
    ys = (np.arange(1, gh + 1, dtype=np.float32)) / gh
    xx, yy = np.meshgrid(xs, ys)  # (gh, gw), row-major like patch order
    coords = np.stack([xx, yy], axis=-1).reshape(-1, 2).clip(0.0, 1.0)
    coord_bias = np.log(coords + 1e-4) - np.log1p(-coords + 1e-4)
    size = np.full_like(coords, 1.0)
    size[:, 0] /= gw
    size[:, 1] /= gh
    size_bias = np.log(size + 1e-4) - np.log1p(-size + 1e-4)
    return jnp.asarray(np.concatenate([coord_bias, size_bias], axis=-1))


# ---------------------------------------------------------------------------
# Checkpoint conversion (HF OwlViTForObjectDetection state_dict → Flax)
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def infer_owlvit_config(state: Mapping[str, Any]) -> OwlVitConfig:
    """Infers tower dims from an HF state_dict; heads follow the
    published configs (width/64)."""
    vw = int(_np(state["owlvit.vision_model.embeddings.class_embedding"]).shape[0])
    pw = _np(state["owlvit.vision_model.embeddings.patch_embedding.weight"])
    patch = pw.shape[-1]
    npos = _np(
        state["owlvit.vision_model.embeddings.position_embedding.weight"]
    ).shape[0]
    grid = int(math.isqrt(npos - 1))
    tok = _np(state["owlvit.text_model.embeddings.token_embedding.weight"])
    proj = _np(state["owlvit.text_projection.weight"]).shape[0]
    n_v = len({k.split(".")[4] for k in state
               if k.startswith("owlvit.vision_model.encoder.layers.")})
    n_t = len({k.split(".")[4] for k in state
               if k.startswith("owlvit.text_model.encoder.layers.")})
    mlp_v = _np(
        state["owlvit.vision_model.encoder.layers.0.mlp.fc1.weight"]
    ).shape[0]
    mlp_t = _np(state["owlvit.text_model.encoder.layers.0.mlp.fc1.weight"]).shape[0]
    maxlen = _np(
        state["owlvit.text_model.embeddings.position_embedding.weight"]
    ).shape[0]
    return OwlVitConfig(
        image_size=grid * patch,
        patch_size=patch,
        vision_width=vw,
        vision_layers=n_v,
        vision_heads=max(1, vw // 64),
        vision_mlp=mlp_v,
        vocab_size=tok.shape[0],
        text_width=tok.shape[1],
        text_layers=n_t,
        text_heads=max(1, tok.shape[1] // 64),
        text_mlp=mlp_t,
        max_text_len=maxlen,
        projection_dim=proj,
    )


def _dense(state, prefix, use_bias=True):
    out = {"kernel": _np(state[prefix + ".weight"]).T}
    if use_bias:
        out["bias"] = _np(state[prefix + ".bias"])
    return out


def _ln(state, prefix):
    return {"scale": _np(state[prefix + ".weight"]),
            "bias": _np(state[prefix + ".bias"])}


def _block(state, prefix):
    p = {}
    attn = prefix + ".self_attn."
    p["self_attn"] = {
        name: _dense(state, attn + name)
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }
    p["layer_norm1"] = _ln(state, prefix + ".layer_norm1")
    p["layer_norm2"] = _ln(state, prefix + ".layer_norm2")
    p["fc1"] = _dense(state, prefix + ".mlp.fc1")
    p["fc2"] = _dense(state, prefix + ".mlp.fc2")
    return p


def convert_owlvit(
    state: Mapping[str, Any], cfg: OwlVitConfig | None = None
) -> tuple[OwlVitConfig, dict]:
    """Converts an HF ``OwlViTForObjectDetection`` state_dict to this
    module's params.  Returns (config, params)."""
    if cfg is None:
        cfg = infer_owlvit_config(state)
    vis: dict[str, Any] = {}
    vp = "owlvit.vision_model."
    pw = _np(state[vp + "embeddings.patch_embedding.weight"])  # (D,3,p,p)
    # torch conv weight (out, c, kh, kw) → (kh·kw·c, out) matching the
    # tower's (ph, pw, c) tile order.
    vis["patch_embed"] = {
        "kernel": pw.transpose(2, 3, 1, 0).reshape(-1, pw.shape[0])
    }
    vis["class_embedding"] = _np(state[vp + "embeddings.class_embedding"])
    vis["position_embedding"] = _np(
        state[vp + "embeddings.position_embedding.weight"]
    )
    vis["pre_layernorm"] = _ln(state, vp + "pre_layernorm")
    vis["post_layernorm"] = _ln(state, vp + "post_layernorm")
    for i in range(cfg.vision_layers):
        vis[f"layers_{i}"] = _block(state, vp + f"encoder.layers.{i}")

    txt: dict[str, Any] = {
        "token_embedding": _np(
            state["owlvit.text_model.embeddings.token_embedding.weight"]
        ),
        "position_embedding": _np(
            state["owlvit.text_model.embeddings.position_embedding.weight"]
        ),
        "final_layer_norm": _ln(state, "owlvit.text_model.final_layer_norm"),
    }
    for i in range(cfg.text_layers):
        txt[f"layers_{i}"] = _block(
            state, f"owlvit.text_model.encoder.layers.{i}"
        )

    params = {
        "vision": vis,
        "text": txt,
        "text_projection": _dense(state, "owlvit.text_projection", use_bias=False),
        "merged_layer_norm": _ln(state, "layer_norm"),
        "class_dense0": _dense(state, "class_head.dense0"),
        "logit_shift": _dense(state, "class_head.logit_shift"),
        "logit_scale": _dense(state, "class_head.logit_scale"),
        "box_dense0": _dense(state, "box_head.dense0"),
        "box_dense1": _dense(state, "box_head.dense1"),
        "box_dense2": _dense(state, "box_head.dense2"),
    }
    return cfg, jax.tree.map(jnp.asarray, params)


def post_process_detection(
    logits: np.ndarray,
    pred_boxes: np.ndarray,
    target_hw: tuple[int, int],
    threshold: float = 0.3,
):
    """HF ``post_process_object_detection`` semantics for one image:
    per-patch best query, sigmoid score threshold, cxcywh → xyxy in
    pixel coordinates.  Returns (boxes (N,4), scores (N,), labels (N,))."""
    logits = np.asarray(logits)
    pred_boxes = np.asarray(pred_boxes)
    labels = logits.argmax(axis=-1)
    scores = 1.0 / (1.0 + np.exp(-logits.max(axis=-1)))
    keep = scores > threshold
    cxcywh = pred_boxes[keep]
    h, w = target_hw
    x0 = (cxcywh[:, 0] - cxcywh[:, 2] / 2) * w
    y0 = (cxcywh[:, 1] - cxcywh[:, 3] / 2) * h
    x1 = (cxcywh[:, 0] + cxcywh[:, 2] / 2) * w
    y1 = (cxcywh[:, 1] + cxcywh[:, 3] / 2) * h
    return (
        np.stack([x0, y0, x1, y1], axis=-1),
        scores[keep],
        labels[keep],
    )
