"""Utilities: flow visualisation, timing, reporting."""

from nsof_tpu.utils import flow_viz, timing  # noqa: F401
from nsof_tpu.utils.timing import StageTimer, time_fn  # noqa: F401
