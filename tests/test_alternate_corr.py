"""Alternate (memory-efficient) correlation mode wired into RAFT."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsof_tpu.models.raft import RAFT, RaftConfig

ON_TPU = jax.default_backend() == "tpu"


@pytest.mark.slow
def test_alternate_matches_allpairs():
    """Same params, same inputs: the AlternateCorrBlock-style lookup must
    reproduce the all-pairs pyramid lookup (pooling commutes with the
    correlation; bilinear sampling == hat-selector contraction)."""
    cfg = RaftConfig(small=True, iters=2, corr_levels=3, corr_radius=3)
    model_ap = RAFT(cfg)
    model_alt = RAFT(dataclasses.replace(cfg, corr_mode="alternate"))
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.integers(0, 255, (1, 64, 96, 3)), jnp.uint8)
    i2 = jnp.asarray(rng.integers(0, 255, (1, 64, 96, 3)), jnp.uint8)
    params = model_ap.init(jax.random.PRNGKey(0), i1, i2, iters=1)["params"]

    lo_ap, up_ap = model_ap.apply(
        {"params": params}, i1, i2, iters=2, test_mode=True
    )
    lo_alt, up_alt = model_alt.apply(
        {"params": params}, i1, i2, iters=2, test_mode=True
    )
    np.testing.assert_allclose(
        np.asarray(up_alt), np.asarray(up_ap), atol=2e-3, rtol=1e-3
    )


@pytest.mark.skipif(not ON_TPU, reason="HBM-scale check needs the TPU")
def test_alternate_runs_where_allpairs_overflows():
    """At 1600×1600 the all-pairs volume alone is 200⁴·4·levels ≈ 8.5 GB —
    beyond what fits alongside activations on one v5e; the alternate mode
    runs in O(H·W) memory."""
    cfg = RaftConfig(
        small=True, iters=1, corr_levels=4, corr_radius=4,
        corr_mode="alternate",
    )
    model = RAFT(cfg)
    i1 = jnp.zeros((1, 1600, 1600, 3), jnp.uint8)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.uint8),
        jnp.zeros((1, 64, 64, 3), jnp.uint8),
        iters=1,
    )["params"]
    lo, up = model.apply({"params": params}, i1, i1, iters=1, test_mode=True)
    assert up.shape == (1, 1600, 1600, 2)
    assert np.isfinite(np.asarray(up)).all()
