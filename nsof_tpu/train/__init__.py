"""Training infrastructure for the deep backends."""

from nsof_tpu.train.loss import sequence_loss  # noqa: F401
from nsof_tpu.train.optim import raft_optimizer  # noqa: F401
