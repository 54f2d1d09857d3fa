"""Torch→Flax checkpoint conversion for the deep velocity backends.

The reference's deep pipelines run *pretrained* torch weights —
``codebase/RAFT/raft_seg.py:595-607`` wraps RAFT in ``nn.DataParallel`` and
``load_state_dict(torch.load('models/raft-things.pth'))``; the checkpoints
come from ``download_models.sh``.  This module maps those state_dicts onto
:mod:`nsof_tpu.models.raft` parameters so the TPU pipelines can run the same
weights.

Conversion rules
----------------
- ``module.`` prefixes (DataParallel) are stripped.
- Conv kernels: torch ``[O, I, kh, kw]`` → flax ``[kh, kw, I, O]``.
- InstanceNorm2d carries no parameters (affine=False) — nothing to map;
  the flax GroupNorm(group_size=1, no scale/bias) is numerically identical
  at eps=1e-5 (raft.NORM_EPS).
- BatchNorm2d (the basic model's cnet, extractor.py:131) is folded into a
  per-channel affine (:class:`nsof_tpu.models.raft.AffineNorm`):
  ``scale = weight/sqrt(running_var+eps)``, ``bias = bias - mean*scale`` —
  exactly BatchNorm in eval mode, which is how the reference runs inference.
  Converted models must therefore be built with
  ``RaftConfig(cnet_norm='frozenbatch')`` (:func:`pretrained_raft` does).
- GroupNorm (norm_fn='group' checkpoints): weight→scale, bias→bias.

Every flax leaf must be produced and every torch tensor consumed (modulo
``num_batches_tracked`` and the ``downsample.1`` aliases of ``norm3/norm4``)
or conversion fails loudly — no silent partial loads.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from nsof_tpu.models.raft import NORM_EPS, RAFT, RaftConfig

__all__ = [
    "load_torch_state_dict",
    "raft_torch_key",
    "convert_raft",
    "pretrained_raft",
]

_LAYER_RE = re.compile(r"^layer(\d+)_(\d+)$")


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a torch checkpoint into plain numpy, stripping ``module.``.

    Uses torch only for deserialisation (cpu map_location); the rest of the
    pipeline never touches torch.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    out = {}
    for k, v in raw.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def raft_torch_key(flax_path: tuple[str, ...]) -> str:
    """Map a flax param path (module names, no leaf) to the torch module
    prefix whose ``.weight``/``.bias``/running stats feed it.

    e.g. ``('fnet', 'layer1_0', 'downsample')`` → ``fnet.layer2.0.downsample.0``
    """
    parts = list(flax_path)
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        m = _LAYER_RE.match(p)
        if m:
            out.append(f"layer{int(m.group(1)) + 1}.{m.group(2)}")
        elif p == "update_block" and i + 1 < len(parts):
            nxt = parts[i + 1]
            if nxt == "Conv_0":
                out += ["update_block", "mask.0"]
                i += 2
                continue
            if nxt == "Conv_1":
                out += ["update_block", "mask.2"]
                i += 2
                continue
            out.append(p)
        elif p in ("Conv_0", "Conv_1") and out and out[-1] == "flow_head":
            out.append("conv1" if p == "Conv_0" else "conv2")
        elif re.fullmatch(r"conv[zrq]_[hv]", p):
            out.append(p[:5] + ("1" if p.endswith("h") else "2"))
        elif p == "downsample":
            out.append("downsample.0")
        else:
            out.append(p)
        i += 1
    return ".".join(out)


def _fold_batchnorm(state: Mapping[str, np.ndarray], key: str):
    eps = NORM_EPS
    w = state[f"{key}.weight"].astype(np.float64)
    b = state[f"{key}.bias"].astype(np.float64)
    mean = state[f"{key}.running_mean"].astype(np.float64)
    var = state[f"{key}.running_var"].astype(np.float64)
    scale = w / np.sqrt(var + eps)
    bias = b - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def convert_raft(
    state: Mapping[str, np.ndarray], cfg: RaftConfig
) -> dict[str, Any]:
    """Convert a reference RAFT state_dict to a flax params tree for
    ``RAFT(cfg)``.  Raises ``ValueError`` on any unmapped/unused tensor or
    shape mismatch."""
    shapes = jax.eval_shape(
        lambda: RAFT(cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 3)),
            iters=1,
        )
    )["params"]
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    used: set[str] = set()
    leaves = []
    errors = []
    for path, spec in flat:
        names = tuple(k.key for k in path)
        base = raft_torch_key(names[:-1])
        leaf = names[-1]
        try:
            if leaf == "kernel":
                w = state[f"{base}.weight"]
                val = np.transpose(w, (2, 3, 1, 0))
                used.add(f"{base}.weight")
            elif leaf == "bias" and f"{base}.running_mean" not in state:
                if f"{base}.bias" in state:
                    val = state[f"{base}.bias"]
                    used.add(f"{base}.bias")
                else:  # GroupNorm torch key
                    val = state[f"{base}.bias"]
            elif leaf in ("scale", "bias"):
                if f"{base}.running_mean" in state:  # folded BatchNorm
                    s, b = _fold_batchnorm(state, base)
                    val = s if leaf == "scale" else b
                    used |= {
                        f"{base}.weight", f"{base}.bias",
                        f"{base}.running_mean", f"{base}.running_var",
                    }
                else:  # plain GroupNorm affine
                    src = "weight" if leaf == "scale" else "bias"
                    val = state[f"{base}.{src}"]
                    used.add(f"{base}.{src}")
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

    unused = []
    for k in state:
        if k in used or k.endswith("num_batches_tracked"):
            continue
        # torch registers downsample norms twice (normN and downsample.1) —
        # the normN alias is the one we consume.
        if ".downsample.1." in k:
            alias_tail = k.split(".downsample.1.")[-1]
            if any(u.endswith(alias_tail) and ".norm" in u for u in used):
                continue
        unused.append(k)
    if errors or unused:
        msg = []
        if errors:
            msg.append("unconverted flax params:\n  " + "\n  ".join(errors))
        if unused:
            msg.append("unused torch tensors:\n  " + "\n  ".join(unused))
        raise ValueError("RAFT checkpoint conversion failed:\n" + "\n".join(msg))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def infer_raft_config(state: Mapping[str, np.ndarray]) -> RaftConfig:
    """Small vs basic from the state_dict structure (bottleneck conv3 ⇒
    small, matching core/raft.py:29-39's hyperparameters)."""
    small = any(k.startswith("fnet.layer1.0.conv3") for k in state)
    if small:
        return RaftConfig(small=True, corr_levels=4, corr_radius=3)
    return RaftConfig(
        small=False, corr_levels=4, corr_radius=4, cnet_norm="frozenbatch"
    )


def pretrained_raft(path: str) -> tuple[RAFT, dict[str, Any]]:
    """Load a reference checkpoint (raft-things.pth / raft-small.pth /
    raft-sintel.pth…) and return ``(model, {'params': ...})`` ready for
    ``model.apply`` — the torch-side equivalent of raft_seg.py:595-607."""
    state = load_torch_state_dict(path)
    cfg = infer_raft_config(state)
    params = convert_raft(state, cfg)
    return RAFT(cfg), {"params": params}
