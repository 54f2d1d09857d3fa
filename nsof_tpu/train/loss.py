"""Training losses and metrics for the deep flow backends.

``sequence_loss`` is RAFT's (codebase/RAFT/train.py:47-72);
``flowformer_sequence_loss`` is FlowFormer's variant
(codebase/FlowFormer-Official/core/loss.py:5-42), which normalises by the
full pixel count rather than the valid count and adds EPE-quality metrics
bucketed by ground-truth flow magnitude (loss.py:33-40)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

Array = jnp.ndarray

MAX_FLOW = 400.0

# FlowFormer's GT-magnitude buckets (core/loss.py:12)
FLOW_GT_THRESHOLDS: tuple[int, ...] = (5, 10, 20)


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


def flowformer_sequence_loss(
    flow_preds: list[Array],
    flow_gt: Array,
    valid: Array,
    gamma: float = 0.8,
    max_flow: float = MAX_FLOW,
    gt_thresholds: Sequence[int] = FLOW_GT_THRESHOLDS,
) -> tuple[Array, dict[str, Array]]:
    """FlowFormer's sequence loss (core/loss.py:5-42).

    Differences vs :func:`sequence_loss`, kept deliberately:
    - each iteration's term is ``(valid * |err|).mean()`` over ALL pixels
      (loss.py:21) — the invalid fraction scales the loss down, unlike
      RAFT's valid-count normalisation;
    - extra metrics ``{t}-th-5px`` = P(EPE<5px | valid ∧ |gt|<t) for
      t ∈ (5, 10, 20) px (loss.py:33-40) — accuracy on slow/medium/fast
      pixels.  Empty buckets yield NaN, matching torch's empty-mean.
    """
    n = len(flow_preds)
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    valid = (valid >= 0.5) & (mag < max_flow)
    vmask = valid[..., None].astype(flow_gt.dtype)

    loss = 0.0
    for i, pred in enumerate(flow_preds):
        w = gamma ** (n - i - 1)
        loss = loss + w * (vmask * jnp.abs(pred - flow_gt)).mean()

    epe_map = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    denom = jnp.maximum(valid.sum(), 1)

    def masked_mean(value, mask):
        cnt = mask.sum()
        return jnp.where(
            cnt > 0,
            jnp.where(mask, value, 0.0).sum() / jnp.maximum(cnt, 1),
            jnp.nan,
        )

    metrics = {
        "epe": jnp.where(valid, epe_map, 0.0).sum() / denom,
        "1px": jnp.where(valid, epe_map < 1, 0).sum() / denom,
        "3px": jnp.where(valid, epe_map < 3, 0).sum() / denom,
        "5px": jnp.where(valid, epe_map < 5, 0).sum() / denom,
    }
    for t in gt_thresholds:
        bucket = valid & (mag < t)
        metrics[f"{t}-th-5px"] = masked_mean(
            (epe_map < 5).astype(jnp.float32), bucket
        )
    return loss, metrics
