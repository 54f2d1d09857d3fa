"""Training-infrastructure tests: datasets, augmentation, checkpointing,
and a smoke training run that actually reduces loss."""

import numpy as np
import pytest

from nsof_tpu.data import flow_datasets as fd


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.normal(size=(12, 17, 2)).astype(np.float32)
    fd.write_flo(tmp_path / "a.flo", flow)
    back = fd.read_flo(tmp_path / "a.flo")
    np.testing.assert_array_equal(back, flow)


def test_kitti_flow_roundtrip(tmp_path, rng):
    flow = (rng.normal(size=(10, 14, 2)) * 20).astype(np.float32)
    valid = rng.random((10, 14)) > 0.3
    fd.write_kitti_flow(tmp_path / "k.png", flow, valid)
    back, v = fd.read_kitti_flow(tmp_path / "k.png")
    np.testing.assert_allclose(back[v], flow[v], atol=1 / 64)
    np.testing.assert_array_equal(v, valid)


def test_augment_pair_shapes(rng):
    cfg = fd.AugmentorConfig(crop_size=(64, 80))
    img = (rng.random((100, 120, 3)) * 255).astype(np.uint8)
    flow = rng.normal(size=(100, 120, 2)).astype(np.float32)
    i1, i2, fl, valid = fd.augment_pair(rng, img, img.copy(), flow, cfg)
    assert i1.shape == (64, 80, 3) and i2.shape == (64, 80, 3)
    assert fl.shape == (64, 80, 2) and valid.shape == (64, 80)


def test_sparse_resize_preserves_points(rng):
    flow = np.zeros((20, 30, 2), np.float32)
    valid = np.zeros((20, 30), bool)
    flow[5, 7] = [2.0, -1.0]
    valid[5, 7] = True
    out, vout = fd._sparse_resize(flow, valid, 2.0)
    ys, xs = np.nonzero(vout)
    assert len(ys) == 1 and ys[0] == 10 and xs[0] == 14
    np.testing.assert_allclose(out[10, 14], [4.0, -2.0])


def test_batch_iterator_synthetic(rng):
    data = fd.synthetic_affine_dataset(rng, n=8, size=(48, 64))
    it = fd.batch_iterator(data, batch_size=4, rng=rng, epochs=1)
    batches = list(it)
    assert len(batches) == 2
    b = batches[0]
    assert b["image1"].shape == (4, 48, 64, 3)
    assert b["flow"].shape == (4, 48, 64, 2)


def test_scan_sintel_layout(tmp_path):
    scene = tmp_path / "training" / "clean" / "alley_1"
    scene.mkdir(parents=True)
    fdir = tmp_path / "training" / "flow" / "alley_1"
    fdir.mkdir(parents=True)
    import cv2

    for i in range(3):
        cv2.imwrite(str(scene / f"frame_{i:04d}.png"),
                    np.zeros((8, 8, 3), np.uint8))
    for i in range(1, 3):
        fd.write_flo(fdir / f"frame_{i:04d}.flo", np.zeros((8, 8, 2)))
    pairs = fd.scan_sintel(tmp_path)
    assert len(pairs) == 2
    assert all(p.flow_path for p in pairs)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from nsof_tpu.train.trainer import restore_checkpoint, save_checkpoint

    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
             "step": np.asarray(7, np.int32)}
    save_checkpoint(tmp_path / "ckpt", 7, state)
    blank = {"w": np.zeros((2, 3), np.float32),
             "step": np.asarray(0, np.int32)}
    restored, step = restore_checkpoint(tmp_path / "ckpt", blank)
    assert step == 7
    np.testing.assert_array_equal(restored["w"], state["w"])


def test_flowformer_loss_magnitude_buckets(rng):
    """flowformer_sequence_loss reproduces the reference's bucketed
    metrics (core/loss.py:33-40) — checked against a direct numpy
    transliteration of the torch code."""
    import jax.numpy as jnp

    from nsof_tpu.train.loss import flowformer_sequence_loss

    b, h, w = 2, 8, 10
    preds = [rng.normal(size=(b, h, w, 2)).astype(np.float32)
             for _ in range(3)]
    gt = (rng.normal(size=(b, h, w, 2)) * 8).astype(np.float32)
    valid = (rng.random((b, h, w)) > 0.2).astype(np.float32)

    loss, metrics = flowformer_sequence_loss(
        [jnp.asarray(p) for p in preds], jnp.asarray(gt),
        jnp.asarray(valid), gamma=0.8)

    # numpy transliteration of core/loss.py:5-42
    mag = np.sqrt((gt**2).sum(-1))
    v = (valid >= 0.5) & (mag < 400)
    ref_loss = sum(
        0.8 ** (len(preds) - i - 1)
        * (v[..., None] * np.abs(p - gt)).mean()
        for i, p in enumerate(preds)
    )
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)

    epe = np.sqrt(((preds[-1] - gt) ** 2).sum(-1))[v]
    gt_len = mag[v]
    for t in (5, 10, 20):
        want = (epe[gt_len < t] < 5).mean() if (gt_len < t).any() else np.nan
        got = float(metrics[f"{t}-th-5px"])
        if np.isnan(want):
            assert np.isnan(got)
        else:
            np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["epe"]), epe.mean(), rtol=1e-5)


def test_twins_lr_factor_optimizer_groups():
    """flowformer_optimizer(twins_lr_factor) updates backbone params with
    the scaled schedule and everything else at full lr
    (core/optimizer/__init__.py:22-33)."""
    import jax
    import jax.numpy as jnp

    from nsof_tpu.train.optim import flowformer_optimizer

    params = {
        "feat_encoder": {"conv": {"kernel": jnp.ones((3,))}},
        "context_encoder": {"conv": {"kernel": jnp.ones((3,))}},
        "memory_decoder": {"proj": {"kernel": jnp.ones((3,))}},
    }
    grads = jax.tree.map(jnp.ones_like, params)

    def first_update(factor):
        tx = flowformer_optimizer(
            lr=1e-3, num_steps=100, wdecay=0.0, twins_lr_factor=factor)
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)
        return upd

    upd = first_update(0.1)
    enc = np.asarray(upd["feat_encoder"]["conv"]["kernel"])[0]
    ctx = np.asarray(upd["context_encoder"]["conv"]["kernel"])[0]
    dec = np.asarray(upd["memory_decoder"]["proj"]["kernel"])[0]
    # identical adam normalised step, different lr ⇒ update ratio = factor
    np.testing.assert_allclose(enc / dec, 0.1, rtol=1e-4)
    np.testing.assert_allclose(ctx / dec, 0.1, rtol=1e-4)

    # factor=None degrades to the single-group optimizer
    upd_none = first_update(None)
    a = np.asarray(upd_none["feat_encoder"]["conv"]["kernel"])[0]
    b = np.asarray(upd_none["memory_decoder"]["proj"]["kernel"])[0]
    np.testing.assert_allclose(a, b, rtol=1e-6)


@pytest.mark.slow
def test_raft_smoke_training_reduces_loss(rng):
    """A few optimization steps on synthetic data must reduce the loss —
    end-to-end check of model+loss+optimizer+data plumbing."""
    import jax
    import jax.numpy as jnp
    import optax

    from nsof_tpu.models.raft import RAFT, RaftConfig
    from nsof_tpu.train.loss import sequence_loss

    model = RAFT(RaftConfig(small=True, iters=2))
    # ≥64 px so the 4-level corr pyramid keeps nonzero spatial dims at 1/8
    data = fd.synthetic_affine_dataset(rng, n=8, size=(64, 96), max_shift=3)
    batches = list(fd.batch_iterator(data, 4, rng, epochs=6))

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batches[0]["image1"]),
        jnp.asarray(batches[0]["image2"]),
        iters=1,
    )["params"]
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            preds = RAFT(RaftConfig(small=True, iters=2)).apply(
                {"params": p}, batch["image1"], batch["image2"], iters=2
            )
            loss, _ = sequence_loss(preds, batch["flow"], batch["valid"])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for b in batches:
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        params, opt_state, loss = step(params, opt_state, jb)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_remat_grad_parity(rng):
    """RaftConfig.remat / FlowFormerConfig.remat change training HBM, not
    numerics: loss and grads match the stored-activation scan."""
    import jax
    import jax.numpy as jnp

    from nsof_tpu.models.flowformer.config import FlowFormerConfig
    from nsof_tpu.models.flowformer.model import FlowFormer
    from nsof_tpu.models.raft import RAFT, RaftConfig

    i1 = jnp.asarray(rng.integers(0, 255, (2, 32, 40, 3)), jnp.uint8)
    i2 = jnp.asarray(rng.integers(0, 255, (2, 32, 40, 3)), jnp.uint8)

    def loss_and_grads(model, params):
        def L(p):
            flows = model.apply({"params": p}, i1, i2)
            if not isinstance(flows, (list, tuple)):
                flows = [flows]
            return sum(jnp.abs(f).mean() for f in flows)

        return float(L(params)), jax.grad(L)(params)

    for make in (
        lambda remat: RAFT(RaftConfig(small=True, iters=3, remat=remat)),
        lambda remat: FlowFormer(FlowFormerConfig(
            cnet="basic", fnet="basic", decoder_depth=3,
            encoder_depth=1, remat=remat)),
    ):
        m0, m1 = make(False), make(True)
        params = m0.init(jax.random.PRNGKey(0), i1[:1], i1[:1])["params"]
        l0, g0 = loss_and_grads(m0, params)
        l1, g1 = loss_and_grads(m1, params)
        assert abs(l0 - l1) < 1e-6, (l0, l1)
        d = max(
            float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
        )
        scale = max(
            float(jnp.abs(a).max()) for a in jax.tree.leaves(g0)
        )
        # recompute reorders f32 reductions → reassociation noise only
        assert d < 2e-4 * (1.0 + scale), (d, scale)
