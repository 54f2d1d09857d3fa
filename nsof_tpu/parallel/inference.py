"""Multi-chip batched inference: shard_map over the data mesh.

The throughput pipeline (seg_batch_fast with its Pallas kernels) is
per-chip; scaling across a pod slices the frame-pair batch over the 'data'
mesh axis with ``shard_map`` — each chip runs its own kernel instance on
its shard, no collectives needed in the steady state (the reference's
closest analogue is thread-based DataParallel inference,
codebase/RAFT/raft_seg.py:602).  Works identically on a virtual CPU mesh
(where the XLA select-shift path replaces the Pallas kernels).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from nsof_tpu.config import PipelineConfig
from nsof_tpu.pipelines.segmentation import seg_batch_fast


def make_sharded_seg_batch(
    mesh: Mesh,
    cfg: PipelineConfig,
    warp_radius: int | None = None,
    kernel_mode: str = "auto",
):
    """Returns a jitted fn(mem [B,gh,gw], prev [B,H,W], next [B,H,W]) with
    B sharded over every device on the 'data' axis.

    B must divide evenly by the data-axis size (pad the final partial
    batch at the call site).
    """

    def local(mem, prev, nxt):
        out = seg_batch_fast(mem, prev, nxt, cfg, warp_radius, kernel_mode)
        return out["mask"], out["box"], out["any_active"]

    spec = P("data")
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec, spec),
        check_rep=False,
    )

    @jax.jit
    def run(mem, prev, nxt):
        mem = jax.device_put(mem, NamedSharding(mesh, spec))
        prev = jax.device_put(prev, NamedSharding(mesh, spec))
        nxt = jax.device_put(nxt, NamedSharding(mesh, spec))
        masks, boxes, active = fn(mem, prev, nxt)
        return {"mask": masks, "box": boxes, "any_active": active}

    return run
