"""Optimizer factories: AdamW + OneCycle + global-norm clipping.

``raft_optimizer`` mirrors fetch_optimizer (codebase/RAFT/train.py:79-86):
AdamW(lr, wd, eps) with OneCycleLR(pct_start=0.05, linear anneal) and
grad-clip 1.0 (:177).  ``flowformer_optimizer`` mirrors
build_optimizer/build_scheduler (codebase/FlowFormer-Official/core/
optimizer/__init__.py:15-61): the same AdamW+OneCycle, optionally with the
twins backbone parameter group trained at ``lr × twins_lr_factor`` (the
pretrained-encoder lr decrease, :22-33, with its own scaled OneCycle,
:54-57).  Loss scaling is unnecessary in bf16 on TPU.
"""

from __future__ import annotations

from typing import Optional

import optax


def _onecycle(lr: float, num_steps: int) -> optax.Schedule:
    return optax.linear_onecycle_schedule(
        transition_steps=num_steps + 100,
        peak_value=lr,
        pct_start=0.05,
        pct_final=1.0,
    )


def raft_optimizer(
    lr: float = 4e-4,
    num_steps: int = 100_000,
    wdecay: float = 1e-4,
    eps: float = 1e-8,
    clip: float = 1.0,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(_onecycle(lr, num_steps), weight_decay=wdecay, eps=eps),
    )


# top-level flax module names of the pretrained twins backbones — the
# reference selects them by substring over torch parameter names
# (optimizer/__init__.py:26-30, "feat_encoder"/"context_encoder")
TWINS_BACKBONE_MODULES = ("feat_encoder", "context_encoder")


def flowformer_optimizer(
    lr: float = 12.5e-5,
    num_steps: int = 120_000,
    wdecay: float = 1e-4,
    eps: float = 1e-8,
    clip: float = 1.0,
    twins_lr_factor: Optional[float] = None,
) -> optax.GradientTransformation:
    """FlowFormer optimizer; with ``twins_lr_factor`` set, backbone
    encoder params get their own OneCycle peaking at ``lr*factor``
    while everything else peaks at ``lr`` (two param groups with two
    schedulers, optimizer/__init__.py:26-33 + :54-57)."""
    if twins_lr_factor is None:
        return raft_optimizer(lr, num_steps, wdecay, eps, clip)

    def group_of(path, _leaf) -> str:
        names = {getattr(k, "key", getattr(k, "name", None)) for k in path}
        return (
            "backbone"
            if names & set(TWINS_BACKBONE_MODULES)
            else "main"
        )

    import jax

    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.multi_transform(
            {
                "main": optax.adamw(
                    _onecycle(lr, num_steps), weight_decay=wdecay, eps=eps
                ),
                "backbone": optax.adamw(
                    _onecycle(lr * twins_lr_factor, num_steps),
                    weight_decay=wdecay, eps=eps,
                ),
            },
            lambda params: jax.tree_util.tree_map_with_path(
                group_of, params
            ),
        ),
    )
