"""Ground-truth mask generation tooling (lang-segment-anything equivalent).

The reference vendors GroundingDINO + SAM ("LangSAM") to produce the
``gtmask/`` folders from text prompts (codebase/lang-segment-anything/
lang_sam/lang_sam.py:117-123; CLI running_test.py:27-56).  Those are
third-party pretrained models; here the pipeline is re-created around a
pluggable :class:`PromptSegmenter` protocol:

- :class:`TransformersSamSegmenter` — HF ``transformers`` SAM with
  box prompts (when weights are available locally),
- :class:`BrightnessSegmenter` — deterministic weightless stand-in for
  tests and offline environments.

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
