"""Multi-chip parallelism: meshes, shardings, sharded training."""

from nsof_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    replicated,
    shard_params_conv_tp,
)
from nsof_tpu.parallel.inference import make_sharded_seg_batch  # noqa: F401
from nsof_tpu.parallel.pipeline import (  # noqa: F401
    make_raft_pp_flow,
    pipeline_stages,
    tied_stage_params,
)
