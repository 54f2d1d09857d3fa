"""FlowFormer (latent cost tokens) family in Flax."""

from nsof_tpu.models.flowformer.config import FlowFormerConfig  # noqa: F401
from nsof_tpu.models.flowformer.model import (  # noqa: F401
    FlowFormer,
    compute_grid_indices,
    compute_weight,
    tiled_flow,
)
