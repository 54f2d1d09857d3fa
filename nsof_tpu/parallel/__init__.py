"""Multi-chip parallelism: meshes, shardings, sharded training."""

from nsof_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    replicated,
    shard_params_conv_tp,
)
from nsof_tpu.parallel.inference import make_sharded_seg_batch  # noqa: F401
