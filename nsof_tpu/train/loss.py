"""RAFT training loss and metrics (codebase/RAFT/train.py:47-72)."""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

MAX_FLOW = 400.0


def sequence_loss(
    flow_preds: list[Array],
    flow_gt: Array,
    valid: Array,
    gamma: float = 0.8,
    max_flow: float = MAX_FLOW,
) -> tuple[Array, dict[str, Array]]:
    """γ-weighted L1 over refinement iterations with valid/max-flow masking.

    Args:
        flow_preds: per-iteration [B, H, W, 2] predictions.
        flow_gt: [B, H, W, 2] ground truth.
        valid: [B, H, W] validity (bool or {0,1}).

    Returns (loss, metrics dict with epe / 1px / 3px / 5px).
    """
    n = len(flow_preds)
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    valid = (valid >= 0.5) & (mag < max_flow)
    denom = jnp.maximum(valid.sum(), 1)

    loss = 0.0
    for i, pred in enumerate(flow_preds):
        w = gamma ** (n - i - 1)
        i_loss = jnp.abs(pred - flow_gt).sum(axis=-1)
        loss = loss + w * jnp.where(valid, i_loss, 0.0).sum() / denom

    epe_map = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    epe = jnp.where(valid, epe_map, 0.0).sum() / denom
    metrics = {
        "epe": epe,
        "1px": jnp.where(valid, epe_map < 1, 0).sum() / denom,
        "3px": jnp.where(valid, epe_map < 3, 0).sum() / denom,
        "5px": jnp.where(valid, epe_map < 5, 0).sum() / denom,
    }
    return loss, metrics
