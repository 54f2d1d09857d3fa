"""Model-family tests: RAFT and FlowFormer forward/training semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsof_tpu.models.raft import RAFT, RaftConfig, coords_grid, upsample_flow_convex


@pytest.fixture(scope="module")
def small_imgs(rng=None):
    r = np.random.default_rng(7)
    a = (r.random((2, 64, 64, 3)) * 255).astype(np.float32)
    b = (r.random((2, 64, 64, 3)) * 255).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b)


@pytest.mark.slow
def test_raft_small_forward(small_imgs):
    a, b = small_imgs
    model = RAFT(RaftConfig(small=True, iters=2))
    params = model.init(jax.random.PRNGKey(0), a, b, iters=1)
    flows = model.apply(params, a, b, iters=3)
    assert len(flows) == 3
    assert flows[-1].shape == (2, 64, 64, 2)
    assert np.isfinite(np.asarray(flows[-1])).all()


@pytest.mark.slow
def test_raft_basic_shapes_and_test_mode(small_imgs):
    a, b = small_imgs
    model = RAFT(RaftConfig(small=False, iters=2))
    params = model.init(jax.random.PRNGKey(1), a, b, iters=1)
    low, up = model.apply(params, a, b, iters=2, test_mode=True)
    assert low.shape == (2, 8, 8, 2)
    assert up.shape == (2, 64, 64, 2)


def test_raft_deterministic_across_batch(small_imgs):
    a, b = small_imgs
    # both batch items identical → identical predictions (no batch coupling
    # — the reference's BatchNorm would break this; our GroupNorm doesn't)
    a2 = jnp.concatenate([a[:1], a[:1]], axis=0)
    b2 = jnp.concatenate([b[:1], b[:1]], axis=0)
    model = RAFT(RaftConfig(small=True, iters=3))
    params = model.init(jax.random.PRNGKey(2), a2, b2, iters=1)
    flow = np.asarray(model.apply(params, a2, b2, iters=3)[-1])
    np.testing.assert_allclose(flow[0], flow[1], atol=1e-4)


def test_convex_upsample_constant_flow():
    flow = jnp.ones((1, 4, 4, 2)) * 2.0
    mask = jnp.zeros((1, 4, 4, 576))  # uniform softmax = 1/9 per neighbour
    up = np.asarray(upsample_flow_convex(flow, mask))
    assert up.shape == (1, 32, 32, 2)
    # interior cells see all 9 neighbours → exactly 8 × 2.0; border cells
    # average zero padding (torch F.unfold semantics, core/raft.py:77)
    np.testing.assert_allclose(up[:, 8:-8, 8:-8], 16.0, atol=1e-5)
    assert up[0, 0, 0, 0] < 16.0


@pytest.mark.slow
def test_raft_gradients_flow(small_imgs):
    a, b = small_imgs
    model = RAFT(RaftConfig(small=True, iters=2))
    params = model.init(jax.random.PRNGKey(3), a, b, iters=1)

    def loss(p):
        flows = model.apply(p, a, b, iters=2)
        return sum(jnp.abs(f).mean() for f in flows)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms))
    assert max(norms) > 0


def test_sequence_loss_metrics():
    from nsof_tpu.train.loss import sequence_loss

    gt = jnp.zeros((1, 16, 16, 2))
    preds = [jnp.ones((1, 16, 16, 2)) * 0.5, jnp.zeros((1, 16, 16, 2))]
    valid = jnp.ones((1, 16, 16))
    loss, metrics = sequence_loss(preds, gt, valid, gamma=0.8)
    # last prediction exact → epe 0, first weighted by gamma
    assert float(metrics["epe"]) == pytest.approx(0.0)
    assert float(metrics["1px"]) == pytest.approx(1.0)
    assert float(loss) == pytest.approx(0.8 * 1.0, rel=1e-5)


@pytest.mark.slow
def test_flowformer_forward_and_grads():
    from nsof_tpu.models.flowformer import FlowFormer, FlowFormerConfig

    cfg = FlowFormerConfig(decoder_depth=2, encoder_depth=1,
                           cnet="basic", fnet="basic")
    model = FlowFormer(cfg)
    r = np.random.default_rng(11)
    a = jnp.asarray((r.random((1, 64, 64, 3)) * 255).astype(np.float32))
    b = jnp.asarray((r.random((1, 64, 64, 3)) * 255).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), a, b)
    flows = model.apply(params, a, b)
    assert len(flows) == 2 and flows[-1].shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(flows[-1])).all()

    def loss(p):
        return jnp.abs(model.apply(p, a, b)[-1]).mean()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(float(jnp.abs(x).max())) for x in jax.tree.leaves(g))


@pytest.mark.slow
def test_flowformer_twins_backbone_shape():
    from nsof_tpu.models.flowformer.twins import TwinsSVTLarge2Stage

    m = TwinsSVTLarge2Stage()
    x = jnp.zeros((1, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 8, 12, 256)


@pytest.mark.slow
def test_tiled_inference_covers_image():
    from nsof_tpu.models.flowformer import (
        compute_grid_indices,
        compute_weight,
        tiled_flow,
    )

    shape = (100, 180)
    tiles = compute_grid_indices(shape, patch_size=(64, 96), min_overlap=20)
    w = compute_weight(tiles, shape, patch_size=(64, 96))
    np.testing.assert_allclose(w.sum(axis=0), 1.0, atol=1e-6)

    # constant-flow stub: blended result must be that constant
    img = np.zeros((1, *shape, 3), np.uint8)

    def fake_apply(t1, t2):
        return np.full(t1.shape[:3] + (2,), 1.5, np.float32)

    out = tiled_flow(fake_apply, img, img, patch_size=(64, 96))
    np.testing.assert_allclose(out, 1.5, atol=1e-5)
