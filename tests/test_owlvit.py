"""Native Flax OWL-ViT: forward parity vs the HF torch module, converter
structure, post-processing, and gt-tooling integration.

The parity test instantiates HF ``OwlViTForObjectDetection`` from a
tiny config (random weights, no downloads), feeds the SAME state_dict
through ``convert_owlvit``, and checks logits/boxes agree — proving a
real ``google/owlvit-base-patch32`` checkpoint would load and run.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from nsof_tpu.models.owlvit import (  # noqa: E402
    TINY_OWLVIT,
    OwlVit,
    convert_owlvit,
    infer_owlvit_config,
    post_process_detection,
)


@pytest.fixture(scope="module")
def torch_tiny():
    torch = pytest.importorskip("torch")
    from transformers import OwlViTConfig, OwlViTForObjectDetection

    cfg = TINY_OWLVIT
    hf_cfg = OwlViTConfig(
        projection_dim=cfg.projection_dim,
        text_config=dict(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.text_width,
            intermediate_size=cfg.text_mlp,
            num_hidden_layers=cfg.text_layers,
            num_attention_heads=cfg.text_heads,
            max_position_embeddings=cfg.max_text_len,
        ),
        vision_config=dict(
            hidden_size=cfg.vision_width,
            intermediate_size=cfg.vision_mlp,
            num_hidden_layers=cfg.vision_layers,
            num_attention_heads=cfg.vision_heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
        ),
    )
    torch.manual_seed(0)
    model = OwlViTForObjectDetection(hf_cfg)
    model.eval()
    return torch, model


def test_forward_parity_vs_hf_torch(torch_tiny):
    torch, model = torch_tiny
    cfg = TINY_OWLVIT
    rng = np.random.default_rng(7)
    pixels = rng.standard_normal(
        (1, 3, cfg.image_size, cfg.image_size), dtype=np.float32
    )
    # Two queries: one real, one all-padding (first token 0 → masked).
    ids = np.zeros((2, cfg.max_text_len), dtype=np.int64)
    ids[0, :5] = [1, 42, 17, 9, 98]  # 98 = "EOS" (highest id present)
    attn = (ids > 0).astype(np.int64)

    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(pixels),
            attention_mask=torch.from_numpy(attn),
        )
    ref_logits = out.logits.numpy()
    ref_boxes = out.pred_boxes.numpy()

    _, params = convert_owlvit(model.state_dict(), cfg)
    got = OwlVit(cfg).apply(
        {"params": params},
        jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(ids.reshape(1, 2, -1)),
    )
    logits = np.asarray(got["logits"])
    boxes = np.asarray(got["pred_boxes"])
    assert logits.shape == ref_logits.shape
    assert boxes.shape == ref_boxes.shape
    # the valid query's logits and all boxes must match tightly
    np.testing.assert_allclose(
        logits[..., 0], ref_logits[..., 0], rtol=0, atol=3e-4
    )
    np.testing.assert_allclose(boxes, ref_boxes, rtol=0, atol=3e-4)
    # the padded query is masked to dtype-min in both
    assert (logits[..., 1] < -1e30).all()
    assert (ref_logits[..., 1] < -1e30).all()


def test_infer_config_roundtrip(torch_tiny):
    _, model = torch_tiny
    cfg = infer_owlvit_config(model.state_dict())
    assert cfg.image_size == TINY_OWLVIT.image_size
    assert cfg.patch_size == TINY_OWLVIT.patch_size
    assert cfg.vision_width == TINY_OWLVIT.vision_width
    assert cfg.vision_layers == TINY_OWLVIT.vision_layers
    assert cfg.text_width == TINY_OWLVIT.text_width
    assert cfg.text_layers == TINY_OWLVIT.text_layers
    assert cfg.vocab_size == TINY_OWLVIT.vocab_size
    assert cfg.projection_dim == TINY_OWLVIT.projection_dim


def test_post_process_matches_hf(torch_tiny):
    torch, _ = torch_tiny
    from transformers import OwlViTImageProcessor

    rng = np.random.default_rng(3)
    logits = rng.standard_normal((1, 16, 2)).astype(np.float32) * 3
    boxes = rng.uniform(0.1, 0.6, size=(1, 16, 4)).astype(np.float32)

    proc = OwlViTImageProcessor()

    class _Out:
        pass

    o = _Out()
    o.logits = torch.from_numpy(logits)
    o.pred_boxes = torch.from_numpy(boxes)
    ref = proc.post_process_object_detection(
        o, threshold=0.5, target_sizes=torch.tensor([[480, 640]])
    )[0]

    got_boxes, got_scores, got_labels = post_process_detection(
        logits[0], boxes[0], (480, 640), threshold=0.5
    )
    order = np.argsort(ref["scores"].numpy())[::-1]
    got_order = np.argsort(got_scores)[::-1]
    np.testing.assert_allclose(
        got_scores[got_order], np.sort(ref["scores"].numpy())[::-1], atol=1e-6
    )
    np.testing.assert_allclose(
        got_boxes[got_order],
        ref["boxes"].numpy()[order],
        atol=1e-3,
    )
    np.testing.assert_array_equal(
        got_labels[got_order], ref["labels"].numpy()[order]
    )


def test_flax_proposer_runs_weightless_interface():
    """The gt-tooling proposer protocol holds for the native model with
    random weights (no HF downloads): returns [x0,y0,x1,y1] lists."""
    import jax

    from nsof_tpu.data.gt_tooling import FlaxOwlVitBoxProposer

    cfg = TINY_OWLVIT
    params = OwlVit(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        jnp.zeros((1, 1, cfg.max_text_len), dtype=jnp.int32),
    )["params"]

    def tokenizer(text):
        ids = np.zeros((cfg.max_text_len,), dtype=np.int32)
        toks = [1 + (hash(w) % (cfg.vocab_size - 2)) for w in text.split()]
        ids[: len(toks) + 2] = [1] + toks[: cfg.max_text_len - 2] + [98]
        return ids

    prop = FlaxOwlVitBoxProposer.from_params(
        cfg, params, tokenizer, score_threshold=-1.0
    )
    img = np.random.default_rng(0).integers(
        0, 255, size=(48, 64, 3), dtype=np.uint8
    )
    boxes = prop(img, "moving object")
    assert isinstance(boxes, list)
    assert all(len(b) == 4 for b in boxes)
    # threshold -1 keeps every patch: all boxes inside the image
    arr = np.asarray(boxes)
    assert (arr[:, 0] < arr[:, 2]).all() and (arr[:, 1] < arr[:, 3]).all()
    assert arr[:, 2].max() <= 64 + 1e-3 and arr[:, 3].max() <= 48 + 1e-3
