"""Torch→Flax checkpoint conversion for FlowFormer.

The reference's FF pipelines load pretrained torch weights
(``ff_seg.py:640-658``: ``build_flowformer(things_eval cfg)`` wrapped in
DataParallel + ``load_state_dict``; checkpoints from the FlowFormer
release, e.g. ``checkpoints/things.pth``).  This module maps those
state_dicts onto :mod:`nsof_tpu.models.flowformer` parameters.

Structural notes (torch module paths from
``codebase/FlowFormer-Official/core/FlowFormer/LatentCostFormer/``):

- the torch model nests the feature backbone INSIDE MemoryEncoder
  (``memory_encoder.feat_encoder``, encoder.py:316) while the context
  backbone sits at top level (``context_encoder``, transformer.py:27);
  both are timm twins_svt_large wrappers with the trunk under ``.svt``;
- twins GSA packs k/v in one ``kv`` Linear (twins.py:646) — split here;
- the GMA attention registers a RelPosEmb (``att.pos_emb``) that its
  forward never uses (gma.py:52,64-73) — those tensors are tolerated and
  dropped, as are the deleted-stage leftovers ``svt.norm.*`` (the
  twins wrapper deletes stages 3-4 and the head but keeps the final
  norm, encoders.py:9-17);
- LayerNorm eps conventions are pinned in the flax modules themselves
  (1e-6 in twins blocks per timm's partial, 1e-5 elsewhere).

Every flax leaf must be produced and every torch tensor consumed (modulo
the tolerated set) or conversion fails loudly — no silent partial loads.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from nsof_tpu.models.flowformer.config import FlowFormerConfig
from nsof_tpu.models.flowformer.model import FlowFormer

__all__ = [
    "flowformer_torch_sources",
    "convert_flowformer",
    "pretrained_flowformer",
]

_STAGE_RE = re.compile(r"^stage(\d)$")
_BLOCK_RE = re.compile(r"^block(\d+)$")
_SELF_RE = re.compile(r"^self(\d+)$")
_VERT_RE = re.compile(r"^vert(\d+)$")

# leaf-name translation inside a twins block's attn
_TWINS_ATTN = {"qkv": "qkv", "q": "q", "proj": "proj", "sr": "sr",
               "sr_norm": "norm"}


def _twins_key(parts: list[str]) -> tuple[str, str | None]:
    """Map a path inside TwinsSVTLarge2Stage to the torch ``svt.`` suffix.

    Returns (torch_prefix, half) where half is 'k'/'v' when the tensor is
    one half of the fused ``kv`` Linear.
    """
    stage = int(_STAGE_RE.match(parts[0]).group(1)) - 1
    rest = parts[1:]
    if rest[0] == "patch_embed":
        return f"patch_embeds.{stage}.proj", None
    if rest[0] == "patch_norm":
        return f"patch_embeds.{stage}.norm", None
    if rest[0] == "peg":
        return f"pos_block.{stage}.proj.0", None
    m = _BLOCK_RE.match(rest[0])
    if m:
        j = int(m.group(1))
        base = f"blocks.{stage}.{j}"
        inner = rest[1:]
        if inner[0] == "attn":
            leaf = inner[1]
            if leaf in ("k", "v"):
                return f"{base}.attn.kv", leaf
            return f"{base}.attn.{_TWINS_ATTN[leaf]}", None
        if inner[0] == "mlp":
            fc = "fc1" if inner[1] == "Dense_0" else "fc2"
            return f"{base}.mlp.{fc}", None
        return f"{base}.{inner[0]}", None
    raise KeyError(f"unmapped twins path {parts}")


def _attention_layer_key(base: str, parts: list[str]) -> str:
    """Self/Cross attention layers share naming: norm1/norm2/q/k/v/proj +
    ffn Sequential indices 0 and 3 (encoder.py:162-168,218-224)."""
    if parts[0] == "ffn":
        idx = "0" if parts[1] == "Dense_0" else "3"
        return f"{base}.ffn.{idx}"
    return f"{base}.{parts[0]}"


_VERT_LEAF = {
    "ctx": "attn.context_proj",
    "q": "attn.q",
    "k": "attn.k",
    "v": "attn.v",
    "proj": "attn.proj",
    "srk": "attn.sr_key",
    "srv": "attn.sr_value",
    "srnorm": "attn.norm",
    "norm1": "norm1",
    "norm2": "norm2",
}


def _vert_key(idx: int, parts: list[str]) -> str:
    blk, leaf = parts[0].split("_", 1)
    base = (
        f"vertical_encoder_layers.{idx}."
        f"{'local_block' if blk == 'local' else 'global_block'}"
    )
    if leaf == "mlp":
        fc = "fc1" if parts[1] == "Dense_0" else "fc2"
        return f"{base}.mlp.{fc}"
    return f"{base}.{_VERT_LEAF[leaf]}"


def flowformer_torch_sources(flax_path: tuple[str, ...]) -> tuple[str, str | None]:
    """Torch module prefix (whose .weight/.bias feeds this flax module)
    plus the kv-half selector ('k'/'v') for fused twins GSA tensors.

    ``flax_path`` excludes the leaf kind (kernel/bias/scale/...).
    """
    parts = list(flax_path)
    head = parts[0]
    if head == "context_encoder":
        key, half = _twins_key(parts[1:])
        return f"context_encoder.svt.{key}", half
    if head == "feat_encoder":
        key, half = _twins_key(parts[1:])
        return f"memory_encoder.feat_encoder.svt.{key}", half
    if head == "memory_encoder":
        rest = parts[1:]
        if rest[0] == "channel_convertor":
            return "memory_encoder.channel_convertor", None
        assert rest[0] == "cost_perceiver", rest
        cp = "memory_encoder.cost_perceiver_encoder"
        rest = rest[1:]
        if rest[0] == "patch_embed":
            leaf = rest[1]
            conv_idx = {"proj0": "proj.0", "proj1": "proj.2",
                        "proj2": "proj.4", "ffn0": "ffn_with_coord.0",
                        "ffn1": "ffn_with_coord.2", "norm": "norm"}
            return f"{cp}.patch_embed.{conv_idx[leaf]}", None
        if rest[0] == "latent_tokens":
            return f"{cp}.latent_tokens", None
        if rest[0] == "input_layer":
            return _attention_layer_key(f"{cp}.input_layer", rest[1:]), None
        m = _SELF_RE.match(rest[0])
        if m:
            base = f"{cp}.encoder_layers.{int(m.group(1))}"
            return _attention_layer_key(base, rest[1:]), None
        m = _VERT_RE.match(rest[0])
        if m:
            return f"{cp}.{_vert_key(int(m.group(1)), rest[1:])}", None
        raise KeyError(f"unmapped encoder path {parts}")
    if head == "memory_decoder":
        rest = parts[1:]
        md = "memory_decoder"
        if rest[0] in ("Conv_0", "Conv_1"):  # flow_token_encoder convs
            idx = "0" if rest[0] == "Conv_0" else "2"
            return f"{md}.flow_token_encoder.{idx}", None
        if rest[0] == "proj":
            return f"{md}.proj", None
        if rest[0] == "att":
            return f"{md}.att.to_qk", None
        if rest[0] in ("mem_k", "mem_v"):
            return f"{md}.decoder_layer.cross_attend.{rest[0][-1]}", None
        if rest[0] == "decoder_layer":
            base = f"{md}.decoder_layer.cross_attend"
            return _attention_layer_key(base, rest[1:]), None
        if rest[0] == "update_block":
            ub = f"{md}.update_block"
            inner = rest[1:]
            if inner[0] in ("Conv_0", "Conv_1"):  # mask head
                idx = "0" if inner[0] == "Conv_0" else "2"
                return f"{ub}.mask.{idx}", None
            if inner[0] == "aggregator":
                if inner[1] == "gamma":
                    return f"{ub}.aggregator.gamma", None
                return f"{ub}.aggregator.{inner[1]}", None
            if inner[0] == "encoder":
                return f"{ub}.encoder.{inner[1]}", None
            if inner[0] == "flow_head":
                conv = "conv1" if inner[1] == "Conv_0" else "conv2"
                return f"{ub}.flow_head.{conv}", None
            if inner[0] == "gru":
                m = re.fullmatch(r"conv([zrq])_([hv])", inner[1])
                num = "1" if m.group(2) == "h" else "2"
                return f"{ub}.gru.conv{m.group(1)}{num}", None
        raise KeyError(f"unmapped decoder path {parts}")
    raise KeyError(f"unmapped path {parts}")


# torch tensors legitimately absent from the flax tree
_TOLERATED = (
    # GMA RelPosEmb: registered but unused in forward (gma.py:52,64-73)
    re.compile(r"memory_decoder\.att\.pos_emb\."),
    # twins wrapper keeps the (unused) final trunk norm of the full model
    re.compile(r"(memory_encoder\.feat_encoder|context_encoder)\.svt\.norm\."),
    re.compile(r"\.num_batches_tracked$"),
)


def convert_flowformer(
    state: Mapping[str, np.ndarray],
    cfg: FlowFormerConfig | None = None,
    image_hw: tuple[int, int] = (64, 96),
) -> dict[str, Any]:
    """Convert a reference FlowFormer state_dict into a flax params tree
    for ``FlowFormer(cfg)``.  Raises ``ValueError`` on any unmapped or
    unused tensor / shape mismatch."""
    cfg = cfg or FlowFormerConfig()
    model = FlowFormer(cfg)
    h, w = image_hw
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, h, w, 3)),
            jnp.zeros((1, h, w, 3)),
        )
    )["params"]
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    used: set[str] = set()
    leaves = []
    errors = []
    for path, spec in flat:
        names = tuple(k.key for k in path)
        leaf = names[-1]
        try:
            # direct params (latent_tokens/gamma) are themselves the last
            # path element; module leaves (kernel/bias/scale) drop it
            src_path = names if leaf in ("latent_tokens", "gamma") else names[:-1]
            base, half = flowformer_torch_sources(src_path)
            if leaf == "kernel":
                w_t = state[f"{base}.weight"]
                used.add(f"{base}.weight")
                if half is not None:  # fused kv Linear: rows are out dims
                    dim = w_t.shape[0] // 2
                    w_t = w_t[:dim] if half == "k" else w_t[dim:]
                if w_t.ndim == 4:  # conv OIHW → HWIO
                    val = np.transpose(w_t, (2, 3, 1, 0))
                else:  # linear [out, in] → [in, out]
                    val = np.transpose(w_t, (1, 0))
            elif leaf == "bias":
                b_t = state[f"{base}.bias"]
                used.add(f"{base}.bias")
                if half is not None:
                    dim = b_t.shape[0] // 2
                    b_t = b_t[:dim] if half == "k" else b_t[dim:]
                val = b_t
            elif leaf == "scale":  # LayerNorm
                val = state[f"{base}.weight"]
                used.add(f"{base}.weight")
            elif leaf in ("latent_tokens", "gamma"):
                val = state[base]
                used.add(base)
            else:
                raise KeyError(f"unhandled leaf kind {leaf!r}")
        except KeyError as exc:
            errors.append(f"{'/'.join(names)}: missing torch source ({exc})")
            continue
        if tuple(val.shape) != tuple(spec.shape):
            errors.append(
                f"{'/'.join(names)}: shape {val.shape} != {spec.shape} "
                f"(from {base})"
            )
            continue
        leaves.append(jnp.asarray(val, dtype=spec.dtype))

    unused = [
        k for k in state
        if k not in used and not any(p.search(k) for p in _TOLERATED)
    ]
    if errors or unused:
        msg = []
        if errors:
            msg.append("unconverted flax params:\n  " + "\n  ".join(errors))
        if unused:
            msg.append("unused torch tensors:\n  " + "\n  ".join(unused))
        raise ValueError(
            "FlowFormer checkpoint conversion failed:\n" + "\n".join(msg)
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def pretrained_flowformer(
    path: str, cfg: FlowFormerConfig | None = None
) -> tuple[FlowFormer, dict[str, Any]]:
    """Load a reference FF checkpoint (things.pth / sintel.pth…) and
    return ``(model, {'params': ...})`` — the torch-side equivalent of
    ff_seg.py:640-658."""
    from nsof_tpu.models.convert import load_torch_state_dict

    cfg = cfg or FlowFormerConfig()
    state = load_torch_state_dict(path)
    params = convert_flowformer(state, cfg)
    return FlowFormer(cfg), {"params": params}
