"""Deep velocity-inference backends (RAFT; FlowFormer in later rounds)."""

from nsof_tpu.models.raft import RAFT, RaftConfig  # noqa: F401
