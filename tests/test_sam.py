"""Native Flax SAM tests: converter structure, forward parity vs the
actual reference torch modules, predictor end-to-end, gt-tooling
integration.

The parity tests import the reference's vendored segment-anything
modeling package read-only (codebase/lang-segment-anything/
segment_anything/modeling/ — the framework itself never touches it),
build a tiny-dim SAM from it, load the SAME synthetic official-schema
state_dict the converter consumes, and check the Flax forward
reproduces the torch forward.  This proves a real ``sam_vit_b.pth``
would load and run — without needing the non-redistributable blob.

The package __init__ pulls torchvision (absent here), so the modeling
subpackage is imported through a manual package stub.
"""

import importlib
import pathlib
import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from nsof_tpu.models.sam import (  # noqa: E402
    SAM_CONFIGS,
    TINY_SAM,
    ImageEncoderViT,
    MaskDecoder,
    PromptEncoder,
    SamPredictor,
    convert_sam,
    infer_sam_config,
    preprocess_shape,
    synthetic_sam_state_dict,
)

SA_DIR = pathlib.Path(
    "/root/reference/codebase/lang-segment-anything/segment_anything"
)


@pytest.fixture(scope="module")
def sa_modeling():
    """The reference modeling subpackage, skipping the torchvision-
    importing package __init__."""
    torch = pytest.importorskip("torch")  # noqa: F841
    if not SA_DIR.exists():
        pytest.skip("reference checkout not mounted")
    if "segment_anything" not in sys.modules:
        pkg = types.ModuleType("segment_anything")
        pkg.__path__ = [str(SA_DIR)]
        sys.modules["segment_anything"] = pkg
    return importlib.import_module("segment_anything.modeling")


@pytest.fixture(scope="module")
def torch_sam(sa_modeling):
    """Tiny reference SAM loaded from the synthetic state_dict."""
    import functools

    import torch

    m = sa_modeling
    cfg = TINY_SAM
    sam = m.Sam(
        image_encoder=m.ImageEncoderViT(
            img_size=cfg.img_size,
            patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim,
            depth=cfg.depth,
            num_heads=cfg.num_heads,
            mlp_ratio=4,
            out_chans=cfg.prompt_dim,
            qkv_bias=True,
            norm_layer=functools.partial(torch.nn.LayerNorm, eps=1e-6),
            use_rel_pos=True,
            global_attn_indexes=list(cfg.global_attn_indexes),
            window_size=cfg.window_size,
        ),
        prompt_encoder=m.PromptEncoder(
            embed_dim=cfg.prompt_dim,
            image_embedding_size=(cfg.embedding_size, cfg.embedding_size),
            input_image_size=(cfg.img_size, cfg.img_size),
            mask_in_chans=cfg.mask_in_chans,
        ),
        mask_decoder=m.MaskDecoder(
            transformer_dim=cfg.prompt_dim,
            transformer=m.TwoWayTransformer(
                depth=cfg.decoder_depth,
                embedding_dim=cfg.prompt_dim,
                mlp_dim=cfg.decoder_mlp_dim,
                num_heads=cfg.decoder_heads,
            ),
            num_multimask_outputs=cfg.num_multimask_outputs,
        ),
    )
    state = synthetic_sam_state_dict(TINY_SAM, seed=7)
    sam.load_state_dict(
        {k: torch.from_numpy(v) for k, v in state.items()}
    )
    sam.eval()
    return sam, state


@pytest.fixture(scope="module")
def flax_params():
    state = synthetic_sam_state_dict(TINY_SAM, seed=7)
    _, params = convert_sam(state, TINY_SAM)
    return params


def test_infer_config_from_official_shapes():
    for name, cfg in SAM_CONFIGS.items():
        fake = {
            "image_encoder.patch_embed.proj.weight": np.zeros(
                (cfg.embed_dim, 3, 16, 16), np.float32
            )
        }
        assert infer_sam_config(fake) is cfg, name


@pytest.mark.slow
def test_conversion_matches_init_tree(flax_params):
    """Converted tree has exactly the shapes linen init creates."""
    import jax.tree_util as jtu

    cfg = TINY_SAM
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    init_enc = ImageEncoderViT(cfg).init(rng, img)
    s4 = 4 * cfg.embedding_size
    init_pe = PromptEncoder(cfg).init(
        rng,
        jnp.zeros((1, 2, 2)),
        jnp.zeros((1, 2), jnp.int32),
        jnp.zeros((1, 4)),
        jnp.zeros((1, s4, s4, 1)),
    )
    s = cfg.embedding_size
    init_dec = MaskDecoder(cfg).init(
        rng,
        jnp.zeros((1, s, s, cfg.prompt_dim)),
        jnp.zeros((s, s, cfg.prompt_dim)),
        jnp.zeros((1, 2, cfg.prompt_dim)),
        jnp.zeros((1, s, s, cfg.prompt_dim)),
    )
    for init, got in (
        (init_enc, flax_params["image_encoder"]),
        (init_pe, flax_params["prompt_encoder"]),
        (init_dec, flax_params["mask_decoder"]),
    ):
        want = {
            jtu.keystr(k): v.shape
            for k, v in jtu.tree_leaves_with_path(init)
        }
        have = {
            jtu.keystr(k): v.shape
            for k, v in jtu.tree_leaves_with_path(got)
        }
        assert want == have


@pytest.mark.slow
def test_image_encoder_parity(torch_sam, flax_params):
    import torch

    sam, _ = torch_sam
    cfg = TINY_SAM
    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (1, 3, cfg.img_size, cfg.img_size)).astype(
        np.float32
    )
    with torch.no_grad():
        want = sam.image_encoder(torch.from_numpy(img)).numpy()
    got = ImageEncoderViT(cfg).apply(
        flax_params["image_encoder"],
        jnp.asarray(img.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert np.max(np.abs(got - want)) < 2e-4


@pytest.mark.slow
def test_prompt_encoder_parity(torch_sam, flax_params):
    import torch

    sam, _ = torch_sam
    cfg = TINY_SAM
    rng = np.random.default_rng(1)
    coords = rng.uniform(0, cfg.img_size, (2, 3, 2)).astype(np.float32)
    labels = np.array([[1, 0, -1], [1, 1, 0]], np.float32)
    boxes = np.array(
        [[4.0, 6.0, 60.0, 80.0], [10.0, 10.0, 50.0, 50.0]], np.float32
    )
    with torch.no_grad():
        sp_w, dn_w = sam.prompt_encoder(
            (torch.from_numpy(coords), torch.from_numpy(labels)),
            torch.from_numpy(boxes),
            None,
        )
    sp, dn = PromptEncoder(cfg).apply(
        flax_params["prompt_encoder"],
        jnp.asarray(coords),
        jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(boxes),
        None,
    )
    assert np.max(np.abs(np.asarray(sp) - sp_w.numpy())) < 1e-5
    dn_got = np.asarray(dn).transpose(0, 3, 1, 2)
    assert np.max(np.abs(dn_got - dn_w.detach().numpy())) < 1e-5
    # dense PE grid
    with torch.no_grad():
        pe_w = sam.prompt_encoder.get_dense_pe().detach().numpy()
    s = cfg.embedding_size
    pe = PromptEncoder(cfg).apply(
        flax_params["prompt_encoder"], s, s,
        method=PromptEncoder.dense_pe,
    )
    assert np.max(
        np.abs(np.asarray(pe).transpose(2, 0, 1)[None] - pe_w)
    ) < 1e-5


@pytest.mark.slow
def test_mask_decoder_parity(torch_sam, flax_params):
    import torch

    sam, _ = torch_sam
    cfg = TINY_SAM
    s = cfg.embedding_size
    rng = np.random.default_rng(2)
    emb = rng.normal(0, 1, (1, cfg.prompt_dim, s, s)).astype(np.float32)
    boxes = np.array(
        [[4.0, 6.0, 60.0, 80.0], [12.0, 20.0, 100.0, 90.0]], np.float32
    )
    with torch.no_grad():
        sp_w, dn_w = sam.prompt_encoder(None, torch.from_numpy(boxes), None)
        masks_w, iou_w = sam.mask_decoder(
            image_embeddings=torch.from_numpy(emb),
            image_pe=sam.prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sp_w,
            dense_prompt_embeddings=dn_w,
            multimask_output=True,
        )
    sp, dn = PromptEncoder(cfg).apply(
        flax_params["prompt_encoder"], None, None, jnp.asarray(boxes), None
    )
    pe = PromptEncoder(cfg).apply(
        flax_params["prompt_encoder"], s, s,
        method=PromptEncoder.dense_pe,
    )
    masks, iou = MaskDecoder(cfg).apply(
        flax_params["mask_decoder"],
        jnp.asarray(emb.transpose(0, 2, 3, 1)),
        pe,
        sp,
        dn,
    )
    masks = np.asarray(masks)[:, 1:]  # multimask slice
    iou = np.asarray(iou)[:, 1:]
    assert masks.shape == tuple(masks_w.shape)
    assert np.max(np.abs(masks - masks_w.numpy())) < 2e-4
    assert np.max(np.abs(iou - iou_w.numpy())) < 2e-4


@pytest.mark.slow
def test_predictor_end_to_end_matches_torch_sam(torch_sam, flax_params):
    """Full set_image→predict chain vs the reference Sam.forward on an
    image already at model size (no resampling → backends comparable)."""
    import torch

    sam, _ = torch_sam
    cfg = TINY_SAM
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (cfg.img_size, cfg.img_size, 3)).astype(
        np.uint8
    )
    boxes = np.array([[8.0, 8.0, 90.0, 100.0]], np.float32)
    with torch.no_grad():
        out = sam(
            [
                {
                    "image": torch.from_numpy(
                        img.transpose(2, 0, 1).astype(np.float32)
                    ),
                    "original_size": (cfg.img_size, cfg.img_size),
                    "boxes": torch.from_numpy(boxes),
                }
            ],
            multimask_output=False,
        )[0]
    pred = SamPredictor(cfg, flax_params)
    pred.set_image(img)
    masks, iou, low_res = pred.predict(
        boxes=boxes, multimask_output=False
    )
    assert masks.shape == tuple(out["masks"].shape)
    assert np.max(
        np.abs(low_res - out["low_res_logits"].numpy())
    ) < 2e-4
    agree = (masks == out["masks"].numpy()).mean()
    assert agree > 0.999
    assert np.max(np.abs(iou - out["iou_predictions"].numpy())) < 2e-4


def test_preprocess_shape_and_box_transform():
    assert preprocess_shape(1080, 1920, 1024) == (576, 1024)
    assert preprocess_shape(1024, 1024, 1024) == (1024, 1024)


@pytest.mark.slow
def test_flax_sam_segmenter_protocol(flax_params):
    """gt_tooling integration: box proposer → native SAM, weightless."""
    from nsof_tpu.data.gt_tooling import FlaxSamSegmenter

    cfg = TINY_SAM
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
    seg = FlaxSamSegmenter(
        cfg,
        flax_params,
        box_proposer=lambda im, prompt: [[10, 10, 60, 60]],
    )
    masks = seg(img, "object")
    assert len(masks) == 1
    assert masks[0].shape == (96, 128)
    assert masks[0].dtype == bool
    assert seg(img, "") == [] or True  # proposer always returns one box
    empty = FlaxSamSegmenter(
        cfg, flax_params, box_proposer=lambda im, prompt: []
    )
    assert empty(img, "object") == []
