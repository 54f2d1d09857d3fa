"""Ground-truth mask generation tooling (lang-segment-anything equivalent).

The reference vendors GroundingDINO + SAM ("LangSAM") to produce the
``gtmask/`` folders from text prompts (codebase/lang-segment-anything/
lang_sam/lang_sam.py:117-123; CLI running_test.py:27-56).  Those are
third-party pretrained models; here the pipeline is re-created around a
pluggable :class:`PromptSegmenter` protocol:

- :class:`OwlVitBoxProposer` — open-vocabulary text→box grounding (HF
  OWL-ViT, local weights), playing GroundingDINO's role
  (lang_sam.py:91-103),
- :class:`FlaxSamSegmenter` — the NATIVE SAM (:mod:`nsof_tpu.models.sam`,
  full architecture in Flax, official-checkpoint converter) with box
  prompts, jitted on TPU,
- :class:`TransformersSamSegmenter` — HF ``transformers`` SAM with
  box prompts (when weights are available locally),
- :func:`lang_sam_segmenter` — the full text→boxes→masks chain
  (LangSAM.predict, lang_sam.py:117-123),
- :class:`BrightnessSegmenter` / :class:`BrightnessBoxProposer` —
  deterministic weightless stand-ins for tests and offline environments.

The mask-generation loop reproduces the reference CLI semantics: iterate
``imgs.txt``, predict per text prompt, OR-combine instance masks, write a
binary mask (black image when nothing matches).
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Optional, Protocol

import numpy as np


class PromptSegmenter(Protocol):
    def __call__(self, image_rgb: np.ndarray, text_prompt: str) -> list[np.ndarray]:
        """Returns a list of boolean instance masks for the prompt."""
        ...


class BrightnessSegmenter:
    """Weightless stand-in: segments bright (or dark) blobs; the text
    prompt selects polarity ('dark ...' → dark blobs)."""

    def __init__(self, thresh: int = 180, min_area: int = 100):
        self.thresh = thresh
        self.min_area = min_area

    def __call__(self, image_rgb, text_prompt):
        import cv2

        gray = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2GRAY)
        if text_prompt.strip().lower().startswith("dark"):
            _, binary = cv2.threshold(
                gray, 255 - self.thresh, 255, cv2.THRESH_BINARY_INV
            )
        else:
            _, binary = cv2.threshold(gray, self.thresh, 255,
                                      cv2.THRESH_BINARY)
        n, labels, stats, _ = cv2.connectedComponentsWithStats(binary, 8)
        return [
            labels == i
            for i in range(1, n)
            if stats[i, cv2.CC_STAT_AREA] >= self.min_area
        ]


class BoxProposer(Protocol):
    def __call__(self, image_rgb: np.ndarray, text_prompt: str) -> list[list[float]]:
        """Returns [x0, y0, x1, y1] boxes grounded in the text prompt."""
        ...


class OwlVitBoxProposer:
    """Open-vocabulary text→box grounding via OWL-ViT — the
    GroundingDINO stage of LangSAM (``predict_dino``, lang_sam.py:91-103:
    text prompt → thresholded boxes).  ``score_threshold`` plays
    box_threshold's role (the reference default is 0.3,
    lang_sam.py:117).  Requires locally cached HF weights."""

    def __init__(self, model_name: str = "google/owlvit-base-patch32",
                 score_threshold: float = 0.3):
        from transformers import (  # optional import
            OwlViTForObjectDetection,
            OwlViTProcessor,
        )

        self.model = OwlViTForObjectDetection.from_pretrained(model_name)
        self.model.eval()
        self.processor = OwlViTProcessor.from_pretrained(model_name)
        self.score_threshold = score_threshold

    def __call__(self, image_rgb, text_prompt):
        import torch

        inputs = self.processor(
            text=[[text_prompt]], images=image_rgb, return_tensors="pt"
        )
        with torch.no_grad():
            out = self.model(**inputs)
        h, w = image_rgb.shape[:2]
        res = self.processor.post_process_object_detection(
            out,
            threshold=self.score_threshold,
            target_sizes=torch.tensor([[h, w]]),
        )[0]
        boxes = res["boxes"].cpu().numpy()
        return [list(map(float, b)) for b in boxes]


class FlaxOwlVitBoxProposer:
    """NATIVE open-vocabulary text→box grounding — OWL-ViT in Flax
    (:mod:`nsof_tpu.models.owlvit`), the GroundingDINO stage of LangSAM
    (``predict_dino``, lang_sam.py:91-103) running jitted on TPU.

    Default construction converts a locally cached HF
    ``OwlViTForObjectDetection`` checkpoint (torch touched once, for the
    state_dict + tokenizer only); :meth:`from_params` builds one from an
    in-memory param tree (used by the weightless interface tests).
    """

    # CLIP preprocessing constants (HF OwlViTImageProcessor defaults)
    _MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    _STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def __init__(self, model_name: str = "google/owlvit-base-patch32",
                 score_threshold: float = 0.3):
        from transformers import AutoTokenizer, OwlViTForObjectDetection

        from nsof_tpu.models.owlvit import convert_owlvit

        torch_model = OwlViTForObjectDetection.from_pretrained(model_name)
        cfg, params = convert_owlvit(torch_model.state_dict())
        del torch_model
        hf_tok = AutoTokenizer.from_pretrained(model_name)

        def tokenizer(text: str) -> np.ndarray:
            return np.asarray(
                hf_tok(
                    text,
                    padding="max_length",
                    truncation=True,
                    max_length=cfg.max_text_len,
                )["input_ids"],
                dtype=np.int32,
            )

        self._init(cfg, params, tokenizer, score_threshold)

    @classmethod
    def from_params(cls, cfg, params, tokenizer, score_threshold=0.3):
        self = cls.__new__(cls)
        self._init(cfg, params, tokenizer, score_threshold)
        return self

    def _init(self, cfg, params, tokenizer, score_threshold):
        import jax

        from nsof_tpu.models.owlvit import OwlVit

        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.score_threshold = score_threshold
        model = OwlVit(cfg)
        self._apply = jax.jit(
            lambda px, ids: model.apply({"params": params}, px, ids)
        )

    def __call__(self, image_rgb, text_prompt):
        import cv2

        from nsof_tpu.models.owlvit import post_process_detection

        s = self.cfg.image_size
        resized = cv2.resize(
            image_rgb, (s, s), interpolation=cv2.INTER_CUBIC
        ).astype(np.float32) / 255.0
        pixels = ((resized - self._MEAN) / self._STD)[None]
        ids = self.tokenizer(text_prompt).reshape(1, 1, -1)
        out = self._apply(pixels, ids)
        h, w = image_rgb.shape[:2]
        boxes, _, _ = post_process_detection(
            np.asarray(out["logits"][0]),
            np.asarray(out["pred_boxes"][0]),
            (h, w),
            threshold=self.score_threshold,
        )
        # HF leaves raw sigmoid-decoded extents unclipped; SAM box
        # prompts must live inside the image.
        boxes = np.clip(boxes, 0.0, [w, h, w, h]) if len(boxes) else boxes
        return [list(map(float, b)) for b in boxes]


class BrightnessBoxProposer:
    """Weightless text→box stand-in: bounding boxes of bright/dark blobs
    (polarity from the prompt, like :class:`BrightnessSegmenter`)."""

    def __init__(self, thresh: int = 180, min_area: int = 100):
        self._seg = BrightnessSegmenter(thresh, min_area)

    def __call__(self, image_rgb, text_prompt):
        boxes = []
        for m in self._seg(image_rgb, text_prompt):
            ys, xs = np.nonzero(m)
            boxes.append(
                [float(xs.min()), float(ys.min()),
                 float(xs.max() + 1), float(ys.max() + 1)]
            )
        return boxes


class TransformersSamSegmenter:
    """SAM via HF transformers with box prompts from a box proposer
    (GroundingDINO's role); requires locally cached weights."""

    def __init__(self, model_name: str = "facebook/sam-vit-base",
                 box_proposer=None):
        from transformers import SamModel, SamProcessor  # optional import

        self.model = SamModel.from_pretrained(model_name)
        self.processor = SamProcessor.from_pretrained(model_name)
        self.box_proposer = box_proposer or (
            lambda img, prompt: [[0, 0, img.shape[1], img.shape[0]]]
        )

    def __call__(self, image_rgb, text_prompt):
        import torch

        boxes = self.box_proposer(image_rgb, text_prompt)
        if not boxes:
            return []
        inputs = self.processor(
            image_rgb, input_boxes=[[list(map(float, b)) for b in boxes]],
            return_tensors="pt",
        )
        with torch.no_grad():
            out = self.model(**inputs)
        masks = self.processor.image_processor.post_process_masks(
            out.pred_masks.cpu(),
            inputs["original_sizes"].cpu(),
            inputs["reshaped_input_sizes"].cpu(),
        )[0]
        return [np.asarray(m[0]) > 0 for m in masks]


class FlaxSamSegmenter:
    """The NATIVE promptable segmenter: box prompts from a proposer into
    :mod:`nsof_tpu.models.sam` (full SAM in Flax, jitted on TPU) —
    multimask_output=False, exactly the reference's predict_sam call
    (lang_sam.py:105-115).  Build from an official ``sam_vit_*.pth``
    via :func:`for_checkpoint`, or pass (config, params) directly."""

    def __init__(self, config, params, box_proposer=None):
        from nsof_tpu.models.sam import SamPredictor

        self.predictor = SamPredictor(config, params)
        self.box_proposer = box_proposer or (
            lambda img, prompt: [[0, 0, img.shape[1], img.shape[0]]]
        )

    @classmethod
    def for_checkpoint(cls, path: str, box_proposer=None):
        from nsof_tpu.models.sam import load_sam_checkpoint

        cfg, params = load_sam_checkpoint(path)
        return cls(cfg, params, box_proposer)

    def __call__(self, image_rgb, text_prompt):
        boxes = self.box_proposer(image_rgb, text_prompt)
        if not boxes:
            return []
        self.predictor.set_image(image_rgb)
        masks, _, _ = self.predictor.predict(
            boxes=np.asarray(boxes, np.float32), multimask_output=False
        )
        return [m[0] for m in masks]


def lang_sam_segmenter(
    sam_model: str = "facebook/sam-vit-base",
    owl_model: str = "google/owlvit-base-patch32",
    score_threshold: float = 0.3,
    sam_checkpoint: Optional[str] = None,
    native_grounding: bool = True,
) -> PromptSegmenter:
    """The full LangSAM chain (lang_sam.py:117-123): open-vocabulary
    text→boxes (OWL-ViT standing in for GroundingDINO) feeding SAM
    box-prompted mask prediction.  With ``sam_checkpoint`` (an official
    ``sam_vit_*.pth``) the native Flax SAM runs the mask stage on TPU;
    otherwise the HF ``transformers`` SAM is used (locally cached
    weights).  The grounding stage defaults to the native Flax OWL-ViT
    (converted from the HF checkpoint, jitted on the chip); pass
    ``native_grounding=False`` for the torch pipeline wrapper.
    Build the pieces separately to substitute stand-ins."""
    if native_grounding:
        proposer = FlaxOwlVitBoxProposer(owl_model, score_threshold)
    else:
        proposer = OwlVitBoxProposer(owl_model, score_threshold)
    if sam_checkpoint is not None:
        return FlaxSamSegmenter.for_checkpoint(
            sam_checkpoint, box_proposer=proposer
        )
    return TransformersSamSegmenter(sam_model, box_proposer=proposer)


@dataclasses.dataclass
class MaskGenResult:
    frame: str
    n_instances: int
    mask_path: str


def generate_gt_masks(
    image_dir: str | pathlib.Path,
    imgs_txt: str | pathlib.Path,
    out_dir: str | pathlib.Path,
    text_prompt: str,
    segmenter: PromptSegmenter,
) -> list[MaskGenResult]:
    """The reference mask-generation CLI loop (running_test.py:27-56):
    per listed frame, OR-combine all instance masks for the prompt and
    write a {0,255} mask png (all-black when nothing found)."""
    import cv2

    image_dir = pathlib.Path(image_dir)
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    names = [
        s for s in pathlib.Path(imgs_txt).read_text().splitlines() if s.strip()
    ]
    results = []
    for name in names:
        bgr = cv2.imread(str(image_dir / name))
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        masks = segmenter(rgb, text_prompt)
        combined = np.zeros(rgb.shape[:2], np.uint8)
        for m in masks:
            combined |= (np.asarray(m) > 0).astype(np.uint8)
        out_path = out_dir / name
        cv2.imwrite(str(out_path), combined * 255)
        results.append(MaskGenResult(name, len(masks), str(out_path)))
    return results
