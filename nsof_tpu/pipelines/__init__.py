"""End-to-end neuromorphic pipelines: segmentation, tracking, prediction,
streaming."""

from nsof_tpu.pipelines import (  # noqa: F401
    prediction,
    runner,
    segmentation,
    stream,
    tracking,
)
