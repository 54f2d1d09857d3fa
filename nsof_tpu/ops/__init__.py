"""Core array ops: flow, ROI, morphology, components, colorspace, warping."""

from nsof_tpu.ops import (  # noqa: F401
    canny,
    colorspace,
    components,
    farneback,
    morphology,
    roi,
    ssim,
    warp,
)
from nsof_tpu.ops.farneback import FarnebackParams, farneback as farneback_flow  # noqa: F401
