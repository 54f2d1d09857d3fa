"""Torch→Flax RAFT checkpoint conversion tests.

The round-trip test builds the *actual* reference torch model
(/root/reference/codebase/RAFT/core, imported read-only at test time — the
framework itself never touches it), saves its state_dict, converts with
nsof_tpu.models.convert, and checks the flax forward reproduces the torch
forward on the same image pair.  This proves a real ``raft-things.pth`` /
``raft-small.pth`` checkpoint (download_models.sh) would load and run —
without needing the blobs in this environment.
"""

import pathlib
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from nsof_tpu.models.convert import (  # noqa: E402
    convert_raft,
    infer_raft_config,
    raft_torch_key,
)
from nsof_tpu.models.raft import RAFT, RaftConfig  # noqa: E402

REF_CORE = pathlib.Path("/root/reference/codebase/RAFT/core")


def test_torch_key_mapping_weightless():
    """Structural mapping sanity, no torch involved."""
    cases = {
        ("fnet", "conv1"): "fnet.conv1",
        ("cnet", "norm1"): "cnet.norm1",
        ("fnet", "layer1_0", "downsample"): "fnet.layer2.0.downsample.0",
        ("fnet", "layer2_1", "conv3"): "fnet.layer3.1.conv3",
        ("cnet", "layer0_0", "norm2"): "cnet.layer1.0.norm2",
        ("update_block", "encoder", "convc1"): "update_block.encoder.convc1",
        ("update_block", "gru", "convz_h"): "update_block.gru.convz1",
        ("update_block", "gru", "convq_v"): "update_block.gru.convq2",
        ("update_block", "gru", "convz"): "update_block.gru.convz",
        ("update_block", "flow_head", "Conv_0"): "update_block.flow_head.conv1",
        ("update_block", "Conv_0"): "update_block.mask.0",
        ("update_block", "Conv_1"): "update_block.mask.2",
    }
    for path, want in cases.items():
        assert raft_torch_key(path) == want, path


def test_synthetic_state_dict_roundtrip_weightless():
    """Full-coverage conversion from a state dict synthesised against the
    flax tree: every leaf converts, shapes verified, BN folding exercised —
    runs without torch or the reference checkout."""
    cfg = RaftConfig(small=False, cnet_norm="frozenbatch")
    shapes = jax.eval_shape(
        lambda: RAFT(cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 3)),
            iters=1,
        )
    )["params"]
    rng = np.random.default_rng(0)
    state = {}
    for path, spec in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        names = tuple(k.key for k in path)
        base = raft_torch_key(names[:-1])
        leaf = names[-1]
        if leaf == "kernel":
            kh, kw, ci, co = spec.shape
            state[f"{base}.weight"] = rng.standard_normal(
                (co, ci, kh, kw)
            ).astype(np.float32)
        elif names[0] == "cnet" and "norm" in names[-2]:
            n = spec.shape[0]
            state.setdefault(
                f"{base}.weight", rng.standard_normal(n).astype(np.float32)
            )
            state.setdefault(
                f"{base}.bias", rng.standard_normal(n).astype(np.float32)
            )
            state.setdefault(
                f"{base}.running_mean",
                rng.standard_normal(n).astype(np.float32),
            )
            state.setdefault(
                f"{base}.running_var",
                rng.random(n).astype(np.float32) + 0.5,
            )
        else:
            state[f"{base}.bias"] = rng.standard_normal(
                spec.shape[0]
            ).astype(np.float32)
    params = convert_raft(state, cfg)
    got = jax.tree_util.tree_map(lambda x: x.shape, params)
    want = jax.tree_util.tree_map(lambda s: s.shape, shapes)
    assert got == want

    # corrupting one tensor shape must fail loudly
    bad = dict(state)
    bad["fnet.conv2.weight"] = bad["fnet.conv2.weight"][:, :1]
    with pytest.raises(ValueError):
        convert_raft(bad, cfg)


@pytest.fixture(scope="module")
def torch_raft_module():
    torch = pytest.importorskip("torch")
    if not REF_CORE.is_dir():
        pytest.skip("reference checkout not mounted")
    sys.path.insert(0, str(REF_CORE))
    try:
        import raft as torch_raft  # noqa: F401
    finally:
        sys.path.remove(str(REF_CORE))
    return torch, torch_raft


@pytest.mark.parametrize("small", [False, True], ids=["basic", "small"])
@pytest.mark.slow
def test_forward_parity_vs_reference_torch(torch_raft_module, small):
    """Converted weights reproduce the reference torch forward.

    Mirrors how raft_seg.py:595-607 runs the model (eval mode, test_mode).
    Dims divisible by 64 keep the corr-pyramid pooling identical (the repo
    uses ceil-mode pooling so tiny ROI windows survive; torch floor-mode
    only differs on odd level sizes).
    """
    torch, torch_raft = torch_raft_module
    import argparse

    torch.manual_seed(0 if small else 1)
    args = argparse.Namespace(small=small, mixed_precision=False)
    tmodel = torch_raft.RAFT(args)

    rng = np.random.default_rng(7)
    img1 = rng.integers(0, 255, (1, 3, 128, 128)).astype(np.float32)
    img2 = rng.integers(0, 255, (1, 3, 128, 128)).astype(np.float32)

    if not small:
        # give BatchNorm non-trivial running stats so the affine fold is
        # actually exercised
        tmodel.train()
        with torch.no_grad():
            for _ in range(3):
                tmodel(
                    torch.tensor(img1) + torch.randn(1, 3, 128, 128) * 20,
                    torch.tensor(img2),
                    iters=1,
                    test_mode=True,
                )
    tmodel.eval()

    with torch.no_grad():
        _, tflow = tmodel(
            torch.tensor(img1), torch.tensor(img2), iters=4, test_mode=True
        )
    tflow = tflow.numpy().transpose(0, 2, 3, 1)

    state = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    cfg = infer_raft_config(state)
    assert cfg.small == small
    params = convert_raft(state, cfg)

    jflow = RAFT(cfg).apply(
        {"params": params},
        jnp.asarray(img1.transpose(0, 2, 3, 1)),
        jnp.asarray(img2.transpose(0, 2, 3, 1)),
        iters=4,
        test_mode=True,
    )[1]
    jflow = np.asarray(jflow)

    err = np.abs(jflow - tflow).max()
    assert err < 5e-3, f"max flow deviation {err}"


def _find_reference_checkpoint():
    """raft-*.pth from $RAFT_MODELS_DIR or ./models (download_models.sh
    puts them in models/)."""
    import os

    for root in (os.environ.get("RAFT_MODELS_DIR"), "models"):
        if not root:
            continue
        hits = sorted(pathlib.Path(root).glob("raft-*.pth"))
        if hits:
            return hits[0]
    return None


@pytest.mark.slow
def test_pretrained_checkpoint_on_demo_frames():
    """When a real reference checkpoint is present (download_models.sh),
    it must load and produce physically sane flow on a demo-frames pair
    (raft_seg.py:595-607's usage).  Skipped when the blob is absent."""
    ckpt = _find_reference_checkpoint()
    if ckpt is None:
        pytest.skip("no raft-*.pth checkpoint available")
    demo = pathlib.Path("/root/reference/codebase/RAFT/demo-frames")
    if not demo.is_dir():
        pytest.skip("demo-frames not mounted")
    import cv2

    from nsof_tpu.models.convert import pretrained_raft

    model, variables = pretrained_raft(str(ckpt))
    frames = sorted(demo.glob("*.png"))[:2]
    imgs = [
        cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB) for f in frames
    ]
    from nsof_tpu.models.raft import pad_to_multiple, unpad

    i1, pads = pad_to_multiple(jnp.asarray(imgs[0][None], jnp.float32))
    i2, _ = pad_to_multiple(jnp.asarray(imgs[1][None], jnp.float32))
    _, flow = model.apply(variables, i1, i2, iters=20, test_mode=True)
    flow = np.asarray(unpad(flow, pads))[0]
    mag = np.sqrt((flow**2).sum(-1))
    # sane flow: finite, non-degenerate, bounded displacement
    assert np.isfinite(flow).all()
    assert 0.05 < mag.mean() < 50.0, mag.mean()
