"""Device-mesh utilities for multi-chip execution.

The reference's only multi-device construct is single-process
``nn.DataParallel`` (codebase/RAFT/train.py:138).  The TPU-native
replacement: a ``jax.sharding.Mesh`` over ('data', 'model') with
NamedSharding annotations — XLA GSPMD inserts the collectives (psum for
gradients over 'data', all-gathers for tensor-sharded parameters over
'model'), riding ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but the "
                f"{devices[0].platform if devices else '?'} backend exposes "
                f"only {len(devices)}. Either pass fewer devices, or run "
                "under a virtual CPU mesh (JAX_PLATFORMS=cpu + XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_devices})."
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"make_mesh: {n} devices not divisible by "
            f"model_parallel={model_parallel}"
        )
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_conv_tp(params, mesh: Mesh, min_features: int = 128):
    """Tensor-parallel parameter shardings: shard the output-feature dim of
    large conv kernels / biases over 'model'; replicate the rest.

    With NHWC convs, kernels are [kh, kw, cin, cout]; sharding cout lets
    each model-shard compute a slice of the output channels (XLA GSPMD
    all-gathers activations as needed over ICI).
    """

    def spec_for(path, leaf):
        if leaf.ndim == 4 and leaf.shape[-1] >= min_features:
            return NamedSharding(mesh, P(None, None, None, "model"))
        if leaf.ndim == 1 and leaf.shape[0] >= min_features:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
