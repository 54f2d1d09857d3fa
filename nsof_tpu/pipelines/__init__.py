"""End-to-end neuromorphic pipelines: segmentation, tracking, prediction."""

from nsof_tpu.pipelines import prediction, runner, segmentation, tracking  # noqa: F401
