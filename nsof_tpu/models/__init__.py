"""Deep velocity-inference backends: RAFT and FlowFormer."""

from nsof_tpu.models.raft import RAFT, RaftConfig  # noqa: F401
from nsof_tpu.models.flowformer import FlowFormer, FlowFormerConfig  # noqa: F401
