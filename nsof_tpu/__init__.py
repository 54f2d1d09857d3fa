"""nsof_tpu — TPU-native neuromorphic spatiotemporal optical flow.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``RTCartist/Neuromorphic-Spatiotemporal-Optical-Flow``:

- synaptic-transistor (memristor) temporal-memory simulation, frame- and
  event-driven (:mod:`nsof_tpu.device`),
- on-device ROI extraction from the device-state map (:mod:`nsof_tpu.ops.roi`),
- ROI-gated dense optical flow: a JAX Farneback matching OpenCV semantics
  (:mod:`nsof_tpu.ops.farneback`) plus deep backends (:mod:`nsof_tpu.models`),
- downstream task heads: motion segmentation, object tracking, future-frame
  prediction (:mod:`nsof_tpu.pipelines`),
- data-parallel / model-parallel execution over a TPU mesh
  (:mod:`nsof_tpu.parallel`).

Everything in the compute path is jit-compiled with static shapes; dynamic
ROIs become fixed-size padded windows selected with ``lax.dynamic_slice``.
"""

__version__ = "0.1.0"

from nsof_tpu import device, ops, pipelines, utils  # noqa: F401
