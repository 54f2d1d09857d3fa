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


@pytest.mark.slow  # grad-of-lax.map compile dominates (~5 min)
def test_windowed_corr_gradient_parity():
    """Autodiff through the MXU formulation must match autodiff through
    the plain jnp reference — the role of the reference CUDA extension's
    hand-written backward (correlation_kernel.cu:122-256), which exists
    precisely so AlternateCorrBlock can TRAIN at resolutions where
    all-pairs overflows.  Gradients wrt fmap1, fmap2 and coords."""
    from nsof_tpu.ops.correlation import (
        windowed_correlation,
        windowed_correlation_mxu,
    )

    rng = np.random.default_rng(3)
    b, h, w, c = 2, 6, 8, 16
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    # random non-integer centres (both formulations kink at integers)
    coords = jnp.asarray(
        rng.uniform(0.3, 0.7, (b, h, w, 2))
        + rng.integers(0, 5, (b, h, w, 2)),
        jnp.float32,
    )
    # random cotangent so every output channel's backward is exercised
    ct = jnp.asarray(
        rng.standard_normal((b, h, w, 5 * 5)), jnp.float32
    )

    def loss_ref(f1, f2, crd):
        return jnp.sum(windowed_correlation(f1, f2, crd, 2) * ct)

    def loss_mxu(f1, f2, crd):
        return jnp.sum(windowed_correlation_mxu(f1, f2, crd, 2, tile=16) * ct)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(f1, f2, coords)
    g_mxu = jax.grad(loss_mxu, argnums=(0, 1, 2))(f1, f2, coords)
    for name, a, b_ in zip(("fmap1", "fmap2", "coords"), g_ref, g_mxu):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), atol=1e-4, rtol=1e-4,
            err_msg=f"grad wrt {name} diverges",
        )


@pytest.mark.slow
def test_train_step_alternate_mode():
    """One sharded train step with corr_mode='alternate': gradients flow
    through the windowed-MXU lookup end-to-end (finite loss, params
    move) — alternate mode is trainable, not inference-only."""
    from tests.conftest import run_in_cpu_subprocess

    run_in_cpu_subprocess(
        """
import numpy as np
import jax
import jax.numpy as jnp
from nsof_tpu.models.raft import RaftConfig
from nsof_tpu.parallel.mesh import make_mesh
from nsof_tpu.parallel.train import create_train_state, make_train_step

mesh = make_mesh(8, model_parallel=2)
cfg = RaftConfig(small=True, iters=2, corr_mode='alternate')
model, tx, state = create_train_state(
    jax.random.PRNGKey(0), mesh, cfg=cfg, image_hw=(64, 96),
    lr=1e-4, num_steps=4)
step = make_train_step(model, tx, mesh, iters=2)
rng = np.random.default_rng(0)
batch = {
    'image1': jnp.asarray(rng.random((4, 64, 96, 3)) * 255, jnp.float32),
    'image2': jnp.asarray(rng.random((4, 64, 96, 3)) * 255, jnp.float32),
    'flow': jnp.asarray(rng.standard_normal((4, 64, 96, 2)), jnp.float32),
    'valid': jnp.ones((4, 64, 96), jnp.float32),
}
before = jax.device_get(state.params)
state, metrics = step(state, batch)
assert np.isfinite(float(metrics['loss'])), metrics
after = jax.device_get(state.params)
moved = jax.tree.map(
    lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
    before, after)
assert any(jax.tree.leaves(moved)), 'params did not move'
print('alternate-mode train step ok, loss', float(metrics['loss']))
""",
        timeout=600,
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
