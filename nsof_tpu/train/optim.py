"""Optimizer factory: AdamW + OneCycle + global-norm clipping.

Mirrors fetch_optimizer (codebase/RAFT/train.py:79-86): AdamW(lr, wd,
eps) with OneCycleLR(pct_start=0.05, linear anneal) and grad-clip 1.0
(:177).  Loss scaling is unnecessary in bf16 on TPU.
"""

from __future__ import annotations

import optax


def raft_optimizer(
    lr: float = 4e-4,
    num_steps: int = 100_000,
    wdecay: float = 1e-4,
    eps: float = 1e-8,
    clip: float = 1.0,
) -> optax.GradientTransformation:
    sched = optax.linear_onecycle_schedule(
        transition_steps=num_steps + 100,
        peak_value=lr,
        pct_start=0.05,
        pct_final=1.0,
    )
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(sched, weight_decay=wdecay, eps=eps),
    )
