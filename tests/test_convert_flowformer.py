"""Torch→Flax FlowFormer checkpoint conversion tests.

Mirrors tests/test_convert.py's approach for RAFT: the parity test builds
the *actual* reference torch FlowFormer
(/root/reference/codebase/FlowFormer-Official/core, imported read-only at
test time), saves its state_dict, converts with
nsof_tpu.models.flowformer.convert, and checks the flax forward
reproduces the torch forward.  This proves a real ``things.pth``
checkpoint (the FF release the reference's ff_* pipelines load,
ff_seg.py:640-658) would load and run.

The reference imports timm and loguru, which are not installed here; the
vendored twins.py (a copy of timm's Twins) only needs a handful of timm
helpers, so the fixture installs minimal stubs and routes
``timm.create_model('twins_svt_large')`` to the vendored ``Twins`` class
with the svt-large hyperparameters.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from nsof_tpu.models.flowformer import FlowFormer, FlowFormerConfig  # noqa: E402
from nsof_tpu.models.flowformer.convert import (  # noqa: E402
    convert_flowformer,
    flowformer_torch_sources,
)

FF_CORE = pathlib.Path("/root/reference/codebase/FlowFormer-Official/core")


def test_ff_torch_key_mapping_weightless():
    cases = {
        ("context_encoder", "stage1", "patch_embed"):
            ("context_encoder.svt.patch_embeds.0.proj", None),
        ("context_encoder", "stage2", "block1", "attn", "k"):
            ("context_encoder.svt.blocks.1.1.attn.kv", "k"),
        ("feat_encoder", "stage1", "block0", "attn", "qkv"):
            ("memory_encoder.feat_encoder.svt.blocks.0.0.attn.qkv", None),
        ("feat_encoder", "stage2", "peg"):
            ("memory_encoder.feat_encoder.svt.pos_block.1.proj.0", None),
        ("memory_encoder", "channel_convertor"):
            ("memory_encoder.channel_convertor", None),
        ("memory_encoder", "cost_perceiver", "patch_embed", "proj2"):
            ("memory_encoder.cost_perceiver_encoder.patch_embed.proj.4",
             None),
        ("memory_encoder", "cost_perceiver", "latent_tokens"):
            ("memory_encoder.cost_perceiver_encoder.latent_tokens", None),
        ("memory_encoder", "cost_perceiver", "self2", "ffn", "Dense_1"):
            ("memory_encoder.cost_perceiver_encoder.encoder_layers.2.ffn.3",
             None),
        ("memory_encoder", "cost_perceiver", "vert0", "local_ctx"):
            ("memory_encoder.cost_perceiver_encoder.vertical_encoder_layers"
             ".0.local_block.attn.context_proj", None),
        ("memory_encoder", "cost_perceiver", "vert1", "global_srnorm"):
            ("memory_encoder.cost_perceiver_encoder.vertical_encoder_layers"
             ".1.global_block.attn.norm", None),
        ("memory_decoder", "Conv_0"):
            ("memory_decoder.flow_token_encoder.0", None),
        ("memory_decoder", "mem_k"):
            ("memory_decoder.decoder_layer.cross_attend.k", None),
        ("memory_decoder", "decoder_layer", "ffn", "Dense_0"):
            ("memory_decoder.decoder_layer.cross_attend.ffn.0", None),
        ("memory_decoder", "update_block", "gru", "convz_v"):
            ("memory_decoder.update_block.gru.convz2", None),
        ("memory_decoder", "update_block", "Conv_1"):
            ("memory_decoder.update_block.mask.2", None),
        ("memory_decoder", "update_block", "aggregator", "gamma"):
            ("memory_decoder.update_block.aggregator.gamma", None),
    }
    for path, want in cases.items():
        assert flowformer_torch_sources(path) == want, path


def _synth_state_from_tree(cfg, rng):
    """Synthesise a torch-layout state dict covering the flax tree
    (inverse of the converter's mapping; fused kv tensors created once)."""
    shapes = jax.eval_shape(
        lambda: FlowFormer(cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 96, 3)),
            jnp.zeros((1, 64, 96, 3)),
        )
    )["params"]
    state = {}
    for path, spec in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        names = tuple(k.key for k in path)
        leaf = names[-1]
        src = names if leaf in ("latent_tokens", "gamma") else names[:-1]
        base, half = flowformer_torch_sources(src)
        if leaf == "kernel":
            if spec.ndim == 4:
                kh, kw, ci, co = spec.shape
                tshape = (co, ci, kh, kw)
            else:
                ci, co = spec.shape
                tshape = (co, ci)
            if half is not None:
                tshape = (2 * tshape[0], tshape[1])
            state.setdefault(
                f"{base}.weight",
                rng.standard_normal(tshape).astype(np.float32) * 0.05,
            )
        elif leaf == "bias":
            n = spec.shape[0] * (2 if half is not None else 1)
            state.setdefault(
                f"{base}.bias",
                rng.standard_normal(n).astype(np.float32) * 0.05,
            )
        elif leaf == "scale":
            state.setdefault(
                f"{base}.weight", np.ones(spec.shape, np.float32)
            )
        else:  # latent_tokens / gamma
            state.setdefault(
                base, rng.standard_normal(spec.shape).astype(np.float32)
            )
    return state, shapes


def test_ff_synthetic_state_dict_roundtrip_weightless():
    cfg = FlowFormerConfig(decoder_depth=2)
    rng = np.random.default_rng(0)
    state, shapes = _synth_state_from_tree(cfg, rng)
    # tolerated extras a real checkpoint carries
    state["memory_decoder.att.pos_emb.rel_height.weight"] = np.zeros(
        (319, 128), np.float32
    )
    state["context_encoder.svt.norm.weight"] = np.ones(1024, np.float32)
    params = convert_flowformer(state, cfg)
    got = jax.tree_util.tree_map(lambda x: x.shape, params)
    want = jax.tree_util.tree_map(lambda s: s.shape, shapes)
    assert got == want

    bad = dict(state)
    bad["memory_decoder.proj.weight"] = bad["memory_decoder.proj.weight"][:128]
    with pytest.raises(ValueError):
        convert_flowformer(bad, cfg)
    # an unexpected torch tensor must also fail loudly
    bad = dict(state)
    bad["memory_decoder.unexpected.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError):
        convert_flowformer(bad, cfg)


class _Cfg(dict):
    """yacs-CfgNode stand-in: dict with attribute access (the reference
    code uses both cfg.x and cfg.keys())."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as exc:  # pragma: no cover
            raise AttributeError(k) from exc

    def __setattr__(self, k, v):
        self[k] = v


def _things_eval_cfg(decoder_depth):
    """configs/things_eval.py:18-53 values (pretrain False: random init —
    parity needs shared weights, not the timm download)."""
    lcf = _Cfg(
        pe="linear", dropout=0.0, encoder_latent_dim=256,
        query_latent_dim=64, cost_latent_input_dim=64,
        cost_latent_token_num=8, cost_latent_dim=128,
        arc_type="transformer", cost_heads_num=1, pretrain=False,
        context_concat=False, encoder_depth=3, feat_cross_attn=False,
        patch_size=8, patch_embed="single", no_pe=False, gma="GMA",
        kernel_size=9, rm_res=True, vert_c_dim=64, cost_encoder_res=True,
        cnet="twins", fnet="twins", no_sc=False, only_global=False,
        add_flow_token=True, use_mlp=False, vertical_conv=False,
        decoder_depth=decoder_depth,
    )
    return _Cfg(transformer="latentcostformer", latentcostformer=lcf)


@pytest.fixture(scope="module")
def torch_flowformer():
    """Import the reference torch FlowFormer with timm/loguru stubbed."""
    torch = pytest.importorskip("torch")
    if not FF_CORE.is_dir():
        pytest.skip("reference checkout not mounted")
    nn = torch.nn

    saved = {
        k: sys.modules.get(k)
        for k in list(sys.modules)
        if k == "utils" or k.startswith("utils.")
        or k == "timm" or k.startswith("timm.")
        or k == "loguru" or k == "core" or k.startswith("core.")
    }
    for k in saved:
        sys.modules.pop(k, None)

    # ── timm stub: just what the vendored twins/encoder/decoder import ──
    timm = types.ModuleType("timm")
    timm_data = types.ModuleType("timm.data")
    timm_data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    timm_data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    layers = types.ModuleType("timm.models.layers")

    class Mlp(nn.Module):  # timm layout: fc1/act/fc2 (+no-op drops)
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    layers.Mlp = Mlp
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.activations = types.SimpleNamespace()
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn
    vit = types.ModuleType("timm.models.vision_transformer")
    vit.Attention = object
    helpers = types.ModuleType("timm.models.helpers")
    helpers.build_model_with_cfg = None
    helpers.overlay_external_default_cfg = None
    models = types.ModuleType("timm.models")
    models.layers, models.registry = layers, registry
    models.vision_transformer, models.helpers = vit, helpers
    timm.data, timm.models = timm_data, models

    loguru = types.ModuleType("loguru")
    loguru.logger = types.SimpleNamespace(
        info=lambda *a, **k: None, warning=lambda *a, **k: None
    )

    sys.modules.update({
        "timm": timm, "timm.data": timm_data, "timm.models": models,
        "timm.models.layers": layers, "timm.models.registry": registry,
        "timm.models.vision_transformer": vit,
        "timm.models.helpers": helpers, "loguru": loguru,
    })
    # the reference runs with FlowFormer-Official/ as cwd plus 'core'
    # appended (ff_seg.py:2,14: `from core.FlowFormer import build_flowformer`
    # + absolute `utils.utils` imports inside core)
    sys.path.insert(0, str(FF_CORE))
    sys.path.insert(0, str(FF_CORE.parent))
    try:
        from core.FlowFormer.LatentCostFormer import twins as vtwins

        # route create_model to the vendored Twins (the timm copy,
        # twins.py:839) with twins_svt_large hyperparameters.  The
        # vendored Block.forward always passes `context`, which the plain
        # (non-RPE, timm-equivalent) attention classes don't accept —
        # restore timm's two-arg call.
        class TimmBlock(vtwins.Block):
            def forward(self, x, size, context=None):
                x = x + self.drop_path(self.attn(self.norm1(x), size))
                x = x + self.drop_path(self.mlp(self.norm2(x)))
                return x

        def create_model(name, pretrained=False, **kw):
            assert name == "twins_svt_large"
            return vtwins.Twins(
                patch_size=4, embed_dims=(128, 256, 512, 1024),
                num_heads=(4, 8, 16, 32), mlp_ratios=(4, 4, 4, 4),
                depths=(2, 2, 18, 2), wss=(7, 7, 7, 7),
                sr_ratios=(8, 4, 2, 1), block_cls=TimmBlock,
            )

        timm.create_model = create_model
        from core.FlowFormer import build_flowformer
    except Exception:
        sys.path.remove(str(FF_CORE))
        sys.path.remove(str(FF_CORE.parent))
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
        raise
    yield torch, build_flowformer
    sys.path.remove(str(FF_CORE))
    sys.path.remove(str(FF_CORE.parent))
    for k in ("timm", "timm.data", "timm.models", "timm.models.layers",
              "timm.models.registry", "timm.models.vision_transformer",
              "timm.models.helpers", "loguru"):
        sys.modules.pop(k, None)
    for k in list(sys.modules):
        if k == "core" or k.startswith("core.") or (
            k == "utils" or k.startswith("utils.")
        ):
            sys.modules.pop(k, None)
    for k, v in saved.items():
        if v is not None:
            sys.modules[k] = v


@pytest.mark.slow
def test_ff_forward_parity_vs_reference_torch(torch_flowformer):
    """Converted weights reproduce the reference torch FlowFormer forward
    (eval mode, B=1 — see the batch-alignment note in
    nsof_tpu/models/flowformer/encoder.py::VerticalAttentionLayer)."""
    torch, build_flowformer = torch_flowformer

    depth = 3
    torch.manual_seed(0)
    tmodel = build_flowformer(_things_eval_cfg(depth))
    tmodel.eval()

    rng = np.random.default_rng(11)
    img1 = rng.integers(0, 255, (1, 3, 64, 96)).astype(np.float32)
    img2 = rng.integers(0, 255, (1, 3, 64, 96)).astype(np.float32)

    with torch.no_grad():
        tflow, _ = tmodel(torch.tensor(img1), torch.tensor(img2))
    tflow = tflow.numpy().transpose(0, 2, 3, 1)

    state = {
        k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()
    }
    cfg = FlowFormerConfig(decoder_depth=depth)
    params = convert_flowformer(state, cfg)

    jflow = FlowFormer(cfg).apply(
        {"params": params},
        jnp.asarray(img1.transpose(0, 2, 3, 1)),
        jnp.asarray(img2.transpose(0, 2, 3, 1)),
    )[-1]
    jflow = np.asarray(jflow)

    # the comparison must be non-degenerate (random-init flow is not ~0)
    assert np.abs(tflow).max() > 0.05, np.abs(tflow).max()
    err = np.abs(jflow - tflow).max()
    assert err < 5e-3, f"max flow deviation {err}"
