"""FlowFormer top-level model and tiled inference.

FlowFormer (transformer.py:19-48): Twins-SVT context encoder + memory
encoder (cost volume → latent tokens) + recurrent memory decoder.  Tiled
inference for arbitrary resolutions uses sliding TRAIN_SIZE windows with
min-overlap and gaussian blend weights (visualize_flow.py:27-100).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nsof_tpu.models.flowformer.config import (
    FlowFormerConfig,
    TILE_MIN_OVERLAP,
    TRAIN_SIZE,
)
from nsof_tpu.models.flowformer.decoder import MemoryDecoder
from nsof_tpu.models.flowformer.encoder import MemoryEncoder
from nsof_tpu.models.flowformer.twins import TwinsSVTLarge2Stage
from nsof_tpu.models.raft import BasicEncoder

Array = jnp.ndarray


class FlowFormer(nn.Module):
    cfg: FlowFormerConfig = FlowFormerConfig()

    @nn.compact
    def __call__(self, image1, image2, flow_init=None,
                 test_mode: bool = False):
        """[B, H, W, 3] uint8/float frames (H, W divisible by 8) → list of
        per-step upsampled flows [B, H, W, 2] (or only the final flow when
        ``test_mode``)."""
        c = self.cfg
        dt = c.compute_dtype
        img1 = (2.0 * (image1.astype(jnp.float32) / 255.0) - 1.0).astype(dt)
        img2 = (2.0 * (image2.astype(jnp.float32) / 255.0) - 1.0).astype(dt)

        if c.cnet == "twins":
            context_encoder = TwinsSVTLarge2Stage(dt, name="context_encoder")
        else:
            context_encoder = BasicEncoder(256, "instance", dt,
                                           name="context_encoder")
        context = context_encoder(img1)

        if c.fnet == "twins":
            feat_encoder = TwinsSVTLarge2Stage(dt, name="feat_encoder")
        else:
            feat_encoder = BasicEncoder(256, "instance", dt,
                                        name="feat_encoder")
        imgs = jnp.concatenate([img1, img2], axis=0)
        feats = feat_encoder(imgs)
        b = img1.shape[0]
        feat_s, feat_t = feats[:b], feats[b:]

        cost_memory, _, cost_maps = MemoryEncoder(c, name="memory_encoder")(
            feat_s, feat_t, context
        )
        return MemoryDecoder(c, name="memory_decoder")(
            cost_memory, context, cost_maps, flow_init, test_mode=test_mode
        )


# ── tiled inference ───────────────────────────────────────────────────────


def compute_grid_indices(image_shape, patch_size=TRAIN_SIZE,
                         min_overlap=TILE_MIN_OVERLAP):
    """Sliding-window tile origins (visualize_flow.py:30-46)."""
    if image_shape[0] == patch_size[0]:
        hs = [0]
    else:
        stride = patch_size[0] - min_overlap
        hs = list(range(0, image_shape[0], stride))
        while hs and hs[-1] + patch_size[0] >= image_shape[0]:
            hs = hs[:-1]
        hs.append(image_shape[0] - patch_size[0])
        hs = [h for h in hs if h >= 0]
    if image_shape[1] == patch_size[1]:
        ws = [0]
    else:
        stride = patch_size[1] - min_overlap
        ws = list(range(0, image_shape[1], stride))
        while ws and ws[-1] + patch_size[1] >= image_shape[1]:
            ws = ws[:-1]
        ws.append(image_shape[1] - patch_size[1])
        ws = [w for w in ws if w >= 0]
    return [(h, w) for h in hs for w in ws]


def compute_weight(hws, image_shape, patch_size=TRAIN_SIZE, sigma=0.05):
    """Gaussian blend weights per tile (visualize_flow.py:49-66)."""
    patch_num = len(hws)
    ys, xs = np.meshgrid(
        np.arange(patch_size[0]), np.arange(patch_size[1]), indexing="ij"
    )
    yc, xc = patch_size[0] / 2, patch_size[1] / 2
    g = np.exp(
        -(
            ((ys - yc) / patch_size[0]) ** 2
            + ((xs - xc) / patch_size[1]) ** 2
        )
        / (2 * sigma**2)
    )
    weights = np.zeros((patch_num,) + tuple(image_shape))
    for i, (h, w) in enumerate(hws):
        weights[i, h : h + patch_size[0], w : w + patch_size[1]] = g
    total = weights.sum(axis=0, keepdims=True)
    # divide exactly — gaussian tails underflow far below any epsilon, and
    # clamping the denominator would zero single-tile image corners
    return weights / np.where(total == 0, 1.0, total)


def tiled_flow(apply_fn, image1: np.ndarray, image2: np.ndarray,
               patch_size=TRAIN_SIZE, min_overlap=TILE_MIN_OVERLAP):
    """Full-resolution flow by gaussian-blended sliding tiles.

    ``apply_fn(img1_tile, img2_tile) -> flow [B, th, tw, 2]`` (typically a
    jitted FlowFormer apply taking the final prediction).
    """
    h, w = image1.shape[1:3]
    patch_size = (min(patch_size[0], h), min(patch_size[1], w))
    hws = compute_grid_indices((h, w), patch_size, min_overlap)
    weights = compute_weight(hws, (h, w), patch_size)
    flow_acc = np.zeros(image1.shape[:1] + (h, w, 2), np.float32)
    for i, (hy, wx) in enumerate(hws):
        t1 = image1[:, hy : hy + patch_size[0], wx : wx + patch_size[1]]
        t2 = image2[:, hy : hy + patch_size[0], wx : wx + patch_size[1]]
        fl = np.asarray(apply_fn(t1, t2))
        wgt = weights[i][None, hy : hy + patch_size[0],
                         wx : wx + patch_size[1], None]
        flow_acc[:, hy : hy + patch_size[0], wx : wx + patch_size[1]] += (
            fl * wgt
        )
    return flow_acc
