"""FlowFormer configuration.

Typed-dataclass replacement for the reference's yacs CfgNode trees
(codebase/FlowFormer-Official/configs/*.py).  Defaults mirror
``configs/things_eval.py:18-53`` — the checkpoint configuration the
neuromorphic FF pipelines load (ff_seg.py:648-653).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FlowFormerConfig:
    # latent cost tokens
    encoder_latent_dim: int = 256  # twins stage-2 output dim
    query_latent_dim: int = 64
    cost_latent_input_dim: int = 64
    cost_latent_token_num: int = 8
    cost_latent_dim: int = 128
    cost_heads_num: int = 1
    # encoder
    encoder_depth: int = 3
    patch_size: int = 8
    vert_c_dim: int = 64
    cost_encoder_res: bool = True
    # decoder
    decoder_depth: int = 32
    add_flow_token: bool = True
    use_gma: bool = True
    only_global: bool = False
    # backbone: 'twins' (SVT-large first two stages) or 'basic' (RAFT CNN)
    cnet: str = "twins"
    fnet: str = "twins"
    dropout: float = 0.0
    compute_dtype: Any = jnp.float32
    # training (trainer block, things_eval.py:55-65)
    gamma: float = 0.8
    max_flow: float = 400.0
    canonical_lr: float = 12.5e-5
    adamw_decay: float = 1e-4
    clip: float = 1.0
    num_steps: int = 120_000
    epsilon: float = 1e-8


# Tiled-inference constants (visualize_flow.py:27-100)
TRAIN_SIZE = (432, 960)
TILE_MIN_OVERLAP = 20
