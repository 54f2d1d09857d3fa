"""RAFT optical flow in Flax — the deep velocity-inference backend.

TPU-native re-design of the reference's RAFT (codebase/RAFT/core/raft.py:
86-145): feature/context CNN encoders at 1/8 resolution, an all-pairs
correlation pyramid, iterative ConvGRU refinement, and convex-combination 8×
upsampling.  Differences from the CUDA/torch original, by design:

- NHWC layout throughout (TPU conv-friendly), parameters in float32 with
  optionally bfloat16 activations (``compute_dtype``) — replacing torch AMP
  (core/raft.py:11-21); no loss scaling needed on TPU.
- The all-pairs correlation volume is a single batched matmul (MXU work) —
  the memory-efficient windowed alternative lives in
  :mod:`nsof_tpu.ops.correlation` as a Pallas kernel mirroring
  ``alt_cuda_corr`` (correlation_kernel.cu:19-119).
- The recurrent update loop is a ``lax.scan`` over iterations with static
  iteration count (core/raft.py:123-140 uses a Python loop).

Model sizes match the reference: 'basic' hdim=128 cdim=128 corr r=4, 'small'
hdim=96 cdim=64 r=3 (core/raft.py:29-39).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class RaftConfig:
    small: bool = False
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    compute_dtype: Any = jnp.float32
    # 'allpairs' materialises the [B,H,W,H,W] volume once (CorrBlock);
    # 'alternate' recomputes windowed correlations per lookup against a
    # pooled fmap2 pyramid (AlternateCorrBlock / alt_cuda_corr,
    # core/corr.py:63-91) — O(H·W) memory, for resolutions where the
    # all-pairs volume would not fit in HBM.
    corr_mode: str = "allpairs"

    # Rematerialise the refinement-scan body in the backward pass
    # (jax.checkpoint / nn.remat): activations of the update block are
    # recomputed instead of stored per iteration, trading ~1 extra forward
    # of the scan body for an O(iters) cut in training HBM.  Without it
    # the reference train shape (368×496, batch 6, iters 12) overflows a
    # 16 GB v5e by ~0.9 GB; with it the step fits with room to spare.
    # No effect on inference.
    remat: bool = False

    # Basic cnet normalisation: 'batch' (GroupNorm stand-in, trainable) or
    # 'frozenbatch' (per-channel affine — exactly BatchNorm.eval() with its
    # running stats folded in; use when loading reference torch checkpoints
    # via nsof_tpu.models.convert).
    cnet_norm: str = "batch"

    @property
    def hidden_dim(self) -> int:
        return 96 if self.small else 128

    @property
    def context_dim(self) -> int:
        return 64 if self.small else 128


# torch normalisation layers use eps=1e-5 (flax GroupNorm defaults to 1e-6);
# pinned so converted checkpoints reproduce reference activations exactly.
NORM_EPS = 1e-5


def _torch_pad(k: int):
    """Symmetric torch-style conv padding (padding=k//2).

    flax 'SAME' distributes stride-2 padding asymmetrically (lo=2, hi=3
    for a 7×7/s2 on even sizes) while torch pads k//2 on BOTH sides —
    same output shape, shifted taps.  Strided convs must use this for
    converted reference checkpoints to reproduce torch activations."""
    return ((k // 2, k // 2),) * 2


class AffineNorm(nn.Module):
    """Per-channel affine — ``BatchNorm2d.eval()`` with running stats folded
    into (scale, bias).  The torch→Flax converter emits
    ``scale = weight/sqrt(running_var+eps)``, ``bias = bias - mean*scale``,
    making the 'frozenbatch' cnet bit-exact vs the reference in eval mode
    (codebase/RAFT/core/extractor.py:131 BatchNorm2d)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x * scale + bias).astype(self.dtype)


class ResidualBlock(nn.Module):
    planes: int
    norm: str = "instance"
    stride: int = 1
    dtype: Any = jnp.float32

    def _norm(self, name, features=None):
        features = features or self.planes
        if self.norm == "group":
            return nn.GroupNorm(num_groups=self.planes // 8, name=name,
                                epsilon=NORM_EPS, dtype=self.dtype)
        if self.norm == "instance":
            # InstanceNorm == GroupNorm with one group per channel,
            # no learned stats over batch
            return nn.GroupNorm(num_groups=None, group_size=1, name=name,
                                use_bias=False, use_scale=False,
                                epsilon=NORM_EPS, dtype=self.dtype)
        if self.norm == "batch":
            # batch-independent replacement: GroupNorm(8 channels/group) —
            # BatchNorm's running stats don't map well to pure-functional
            # sharded training; GN is the standard substitute
            return nn.GroupNorm(num_groups=self.planes // 8, name=name,
                                epsilon=NORM_EPS, dtype=self.dtype)
        if self.norm == "frozenbatch":
            return AffineNorm(features, dtype=self.dtype, name=name)
        return lambda x: x

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride,
                    padding=_torch_pad(3), name="conv1", dtype=self.dtype)(x)
        y = nn.relu(self._norm("norm1")(y))
        y = nn.Conv(self.planes, (3, 3), name="conv2", dtype=self.dtype)(y)
        y = nn.relu(self._norm("norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        name="downsample", dtype=self.dtype)(x)
            x = self._norm("norm3")(x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """1×1 → 3×3(stride) → 1×1 bottleneck of RAFT-small's encoders
    (codebase/RAFT/core/extractor.py:60-117)."""

    planes: int
    norm: str = "instance"
    stride: int = 1
    dtype: Any = jnp.float32

    # shares ResidualBlock's norm factory (same norm_fn semantics)
    _norm = ResidualBlock._norm

    @nn.compact
    def __call__(self, x):
        q = self.planes // 4
        y = nn.Conv(q, (1, 1), name="conv1", dtype=self.dtype)(x)
        y = nn.relu(self._norm("norm1", q)(y))
        y = nn.Conv(q, (3, 3), strides=self.stride,
                    padding=_torch_pad(3), name="conv2", dtype=self.dtype)(y)
        y = nn.relu(self._norm("norm2", q)(y))
        y = nn.Conv(self.planes, (1, 1), name="conv3", dtype=self.dtype)(y)
        y = nn.relu(self._norm("norm3")(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        name="downsample", dtype=self.dtype)(x)
            x = self._norm("norm4")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Residual CNN encoder to 1/8 resolution (core/extractor.py:118-267)."""

    output_dim: int = 256
    norm: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=_torch_pad(7),
                    name="conv1", dtype=self.dtype)(x)
        if self.norm == "frozenbatch":
            x = AffineNorm(64, dtype=self.dtype, name="norm1")(x)
        elif self.norm != "none":
            x = nn.GroupNorm(
                num_groups=None if self.norm == "instance" else 8,
                group_size=1 if self.norm == "instance" else None,
                use_bias=self.norm != "instance",
                use_scale=self.norm != "instance",
                epsilon=NORM_EPS, name="norm1", dtype=self.dtype,
            )(x)
        x = nn.relu(x)
        for i, (planes, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            x = ResidualBlock(planes, self.norm, stride, self.dtype,
                              name=f"layer{i}_0")(x)
            x = ResidualBlock(planes, self.norm, 1, self.dtype,
                              name=f"layer{i}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2",
                       dtype=self.dtype)(x)


class SmallEncoder(nn.Module):
    """Bottleneck encoder of RAFT-small (core/extractor.py:170-267)."""

    output_dim: int = 128
    norm: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (7, 7), strides=2, padding=_torch_pad(7),
                    name="conv1", dtype=self.dtype)(x)
        if self.norm == "instance":
            x = nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                             use_scale=False, epsilon=NORM_EPS, name="norm1",
                             dtype=self.dtype)(x)
        x = nn.relu(x)
        for i, (planes, stride) in enumerate([(32, 1), (64, 2), (96, 2)]):
            x = BottleneckBlock(planes, self.norm, stride, self.dtype,
                                name=f"layer{i}_0")(x)
            x = BottleneckBlock(planes, self.norm, 1, self.dtype,
                                name=f"layer{i}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2",
                       dtype=self.dtype)(x)


# ── correlation ───────────────────────────────────────────────────────────


def all_pairs_correlation(fmap1: Array, fmap2: Array) -> Array:
    """[B, H, W, C] × [B, H, W, C] → [B, H, W, H, W] / √C.

    One big MXU matmul (CorrBlock.corr, core/corr.py:52-59).
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    corr = jnp.einsum(
        "bnc,bmc->bnm", f1, f2, preferred_element_type=jnp.float32
    )
    return corr.reshape(b, h, w, h, w) / jnp.sqrt(jnp.float32(c))


def build_corr_pyramid(corr: Array, num_levels: int) -> list[Array]:
    """Average-pool the last two dims into a pyramid (core/corr.py:22-27).

    Ceil-mode pooling (edge-pad to even first) so every level keeps ≥1 px
    even for tiny ROI windows — the reference's floor-mode pooling crashes
    below 2^levels px.
    """
    b, h, w, h2, w2 = corr.shape
    x = corr.reshape(b * h * w, h2, w2, 1)
    pyramid = [x]
    for _ in range(num_levels - 1):
        ph = x.shape[1] % 2
        pw = x.shape[2] % 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        pyramid.append(x)
    return pyramid


def bilinear_sample(img: Array, x: Array, y: Array) -> Array:
    """Bilinear gather with zero padding outside (grid_sample zeros,
    core/utils/utils.py:57-71).  img [N, H, W, C]; x/y [N, ...]."""
    n, h, w, c = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def gather(xi, yi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        batch_idx = jnp.arange(n).reshape((n,) + (1,) * (x.ndim - 1))
        vals = img[batch_idx, yi, xi]
        return vals * valid[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def alternate_corr_lookup(
    fmap1: Array,
    fmap2_pyramid: Sequence[Array],
    coords: Array,
    radius: int,
) -> Array:
    """AlternateCorrBlock-equivalent lookup (core/corr.py:63-91): per
    level, windowed MXU correlation of full-res fmap1 against the pooled
    fmap2, at coords/2^level; levels concatenated then scaled by 1/√C.

    Mathematically equal to ``corr_lookup`` over the all-pairs pyramid
    (average-pooling the volume over the fmap2 axes commutes with the
    correlation), but never materialises the [B,H,W,H,W] volume.

    The Pallas kernel emits the natural (dy outer, dx inner) window order
    (alt_cuda_corr semantics); each level is transposed here to
    ``corr_lookup``'s CorrBlock order so the two corr modes are
    interchangeable under one set of weights (incl. converted torch
    checkpoints — see corr_lookup's docstring).
    """
    from nsof_tpu.ops.correlation import windowed_correlation_mxu

    b, h, w, c = fmap1.shape
    n = 2 * radius + 1
    out = []
    for lvl, f2 in enumerate(fmap2_pyramid):
        win = windowed_correlation_mxu(fmap1, f2, coords / (2**lvl), radius)
        win = win.reshape(b, h, w, n, n).swapaxes(-1, -2).reshape(b, h, w, -1)
        out.append(win)
    return jnp.concatenate(out, axis=-1) / jnp.sqrt(jnp.float32(c))


def build_fmap_pyramid(fmap2: Array, num_levels: int) -> list[Array]:
    """Pooled-fmap2 pyramid for the alternate corr path (ceil-mode, like
    :func:`build_corr_pyramid`, so tiny windows survive)."""
    pyr = [fmap2]
    x = fmap2
    for _ in range(num_levels - 1):
        ph = x.shape[1] % 2
        pw = x.shape[2] % 2
        if ph or pw:
            x = jnp.pad(
                x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge"
            )
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        pyr.append(x)
    return pyr


def corr_lookup(pyramid: Sequence[Array], coords: Array, radius: int) -> Array:
    """Sample (2r+1)² windows at each pyramid level (CorrBlock.__call__,
    core/corr.py:29-50) — gather-free.

    coords: [B, H, W, 2] current target coordinates at 1/8 res.
    Returns [B, H, W, levels*(2r+1)²].

    TPU formulation: instead of per-pixel bilinear gathers (which XLA
    lowers to scalar loops on TPU — measured ~500 ms/frame for RAFT-small
    at 256×384), each level is contracted against dense separable
    hat-function selectors on the MXU:

        out[q, a, b] = Σ_{i,j} vol[q, i, j] · hat(cy[q]+lin[b] − i)
                                            · hat(cx[q]+lin[a] − j)

    ``hat(d) = max(0, 1 − |d|)`` reproduces bilinear interpolation with
    grid_sample's zero padding exactly (the hat is zero beyond the last
    row/col, matching the corner validity mask of
    :func:`bilinear_sample`).  Two batched einsums per level; no gathers.

    Window-flattening order reproduces the reference's quirk exactly: the
    CorrBlock adds ``stack(meshgrid(dy, dx))`` to *(x, y)* coords
    (core/corr.py:36-43), so the OUTER index ``a`` of the flattened
    (2r+1)² window moves along x and the inner ``b`` along y — the
    transpose of the natural row-major order.  Harmless for training
    (weights absorb any fixed permutation) but load-bearing for
    torch-checkpoint conversion (nsof_tpu.models.convert): convc1's
    weights consume this exact order.
    """
    b, h, w, _ = coords.shape
    r = radius
    n = 2 * r + 1
    lin = jnp.linspace(-r, r, n, dtype=jnp.float32)
    q = b * h * w
    crd = coords.reshape(q, 2)
    out = []
    for lvl, corr in enumerate(pyramid):
        _, h2, w2, _ = corr.shape
        vol = corr.reshape(q, h2, w2)
        c = crd / (2**lvl)
        cx = c[:, 0:1] + lin[None, :]  # [q, n] — outer index a → x
        cy = c[:, 1:2] + lin[None, :]  # [q, n] — inner index b → y
        wy = jnp.maximum(
            0.0,
            1.0 - jnp.abs(
                cy[..., None] - jnp.arange(h2, dtype=jnp.float32)
            ),
        )  # [q, n, h2]
        wx = jnp.maximum(
            0.0,
            1.0 - jnp.abs(
                cx[..., None] - jnp.arange(w2, dtype=jnp.float32)
            ),
        )  # [q, n, w2]
        tmp = jnp.einsum(
            "qij,qbi->qbj", vol, wy, preferred_element_type=jnp.float32
        )  # [q, n, w2]
        win = jnp.einsum(
            "qbj,qaj->qab", tmp, wx, preferred_element_type=jnp.float32
        )  # [q, n(a→x), n(b→y)]
        out.append(win.reshape(b, h, w, n * n))
    return jnp.concatenate(out, axis=-1)


# ── update block ─────────────────────────────────────────────────────────


class FlowHead(nn.Module):
    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.hidden, (3, 3), dtype=self.dtype)(x))
        return nn.Conv(2, (3, 3), dtype=self.dtype)(x)


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        for name, ksize in (("h", (1, 5)), ("v", (5, 1))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden_dim, ksize,
                                   name=f"convz_{name}",
                                   dtype=self.dtype)(hx))
            r = nn.sigmoid(nn.Conv(self.hidden_dim, ksize,
                                   name=f"convr_{name}",
                                   dtype=self.dtype)(hx))
            q = nn.tanh(
                nn.Conv(self.hidden_dim, ksize, name=f"convq_{name}",
                        dtype=self.dtype)(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


class ConvGRU(nn.Module):
    hidden_dim: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), name="convz",
                               dtype=self.dtype)(hx))
        r = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), name="convr",
                               dtype=self.dtype)(hx))
        q = nn.tanh(
            nn.Conv(self.hidden_dim, (3, 3), name="convq", dtype=self.dtype)(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    cfg: RaftConfig

    @nn.compact
    def __call__(self, flow, corr):
        dt = self.cfg.compute_dtype
        cor = nn.relu(nn.Conv(256, (1, 1), name="convc1", dtype=dt)(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), name="convc2", dtype=dt)(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), name="convf1", dtype=dt)(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), name="convf2", dtype=dt)(flo))
        out = nn.relu(
            nn.Conv(128 - 2, (3, 3), name="conv", dtype=dt)(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class SmallMotionEncoder(nn.Module):
    cfg: RaftConfig

    @nn.compact
    def __call__(self, flow, corr):
        dt = self.cfg.compute_dtype
        cor = nn.relu(nn.Conv(96, (1, 1), name="convc1", dtype=dt)(corr))
        flo = nn.relu(nn.Conv(64, (7, 7), name="convf1", dtype=dt)(flow))
        flo = nn.relu(nn.Conv(32, (3, 3), name="convf2", dtype=dt)(flo))
        out = nn.relu(
            nn.Conv(80, (3, 3), name="conv", dtype=dt)(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    cfg: RaftConfig

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        dt = self.cfg.compute_dtype
        motion = BasicMotionEncoder(self.cfg, name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.cfg.hidden_dim, dtype=dt, name="gru")(net, x)
        delta = FlowHead(256, dtype=dt, name="flow_head")(net)
        mask = nn.Sequential(
            [
                nn.Conv(256, (3, 3), dtype=dt),
                nn.relu,
                nn.Conv(64 * 9, (1, 1), dtype=dt),
            ],
            name="mask",
        )(net)
        return net, 0.25 * mask, delta


class SmallUpdateBlock(nn.Module):
    cfg: RaftConfig

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        dt = self.cfg.compute_dtype
        motion = SmallMotionEncoder(self.cfg, name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.cfg.hidden_dim, dtype=dt, name="gru")(net, x)
        delta = FlowHead(128, dtype=dt, name="flow_head")(net)
        return net, None, delta


def coords_grid(b: int, h: int, w: int) -> Array:
    """[B, H, W, 2] (x, y) pixel-coordinate grid (core/utils/utils.py:74-77)."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    g = jnp.stack([xs, ys], axis=-1)
    return jnp.broadcast_to(g, (b, h, w, 2))


def upsample_flow_convex(flow: Array, mask: Array) -> Array:
    """Convex-combination 8× upsampling (RAFT.upsample_flow,
    core/raft.py:72-83).  flow [B, H, W, 2]; mask [B, H, W, 576]."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    # 3×3 neighbourhoods of 8*flow: pad then stack shifts
    f = 8.0 * flow
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [
            fp[:, dy : dy + h, dx : dx + w]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=3,
    )  # [B, H, W, 9, 2]
    up = jnp.einsum("bhwkij,bhwkc->bhwijc", mask, neigh)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # B, H, 8(row), W, 8(col), 2
    return up.reshape(b, 8 * h, 8 * w, 2)


def upflow8(flow: Array) -> Array:
    """8× bilinear upsample ×8 (core/utils/utils.py:80-82).

    align_corners=True semantics to match ``F.interpolate(...,
    align_corners=True)``: output pixel i samples input coordinate
    ``i*(in-1)/(out-1)`` (jax.image.resize uses half-pixel centres, which
    would shift converted-checkpoint flows).

    Gather-free: linear interpolation along each axis is a dense matmul
    against a static hat-weight matrix (constant-folded by XLA), so the
    per-iteration upsample inside the refinement scan stays on the MXU
    instead of lowering to TPU-hostile row gathers."""
    b, h, w, c = flow.shape
    oh, ow = 8 * h, 8 * w

    def axis_mat(n_in, n_out):
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / max(
            n_out - 1, 1
        )
        ids = jnp.arange(n_in, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - ids[None, :]))

    wy = axis_mat(h, oh)  # [8h, h]
    wx = axis_mat(w, ow)  # [8w, w]
    t = jnp.einsum("Oh,bhwc->bOwc", wy, flow,
                   preferred_element_type=jnp.float32)
    return 8.0 * jnp.einsum("Pw,bOwc->bOPc", wx, t,
                            preferred_element_type=jnp.float32)


class RAFT(nn.Module):
    """Full RAFT model; call with [B, H, W, 3] uint8/float images.

    Returns the list of per-iteration upsampled flows (train mode) or the
    final (1/8-res flow, full-res flow) pair (test mode) — matching the
    reference's forward contract (core/raft.py:140-145).
    """

    cfg: RaftConfig = RaftConfig()

    @nn.compact
    def __call__(self, image1, image2, iters: int | None = None,
                 flow_init: Array | None = None, test_mode: bool = False):
        cfg = self.cfg
        iters = iters or cfg.iters
        dt = cfg.compute_dtype
        img1 = (2.0 * (image1.astype(jnp.float32) / 255.0) - 1.0).astype(dt)
        img2 = (2.0 * (image2.astype(jnp.float32) / 255.0) - 1.0).astype(dt)

        hdim, cdim = cfg.hidden_dim, cfg.context_dim
        if cfg.small:
            fnet = SmallEncoder(128, "instance", dt, name="fnet")
            cnet = SmallEncoder(hdim + cdim, "none", dt, name="cnet")
        else:
            fnet = BasicEncoder(256, "instance", dt, name="fnet")
            cnet = BasicEncoder(hdim + cdim, cfg.cnet_norm, dt, name="cnet")

        fmap1 = fnet(img1).astype(jnp.float32)
        fmap2 = fnet(img2).astype(jnp.float32)
        if cfg.corr_mode == "alternate":
            f2_pyramid = build_fmap_pyramid(fmap2, cfg.corr_levels)

            def lookup(coords):
                return alternate_corr_lookup(
                    fmap1, f2_pyramid, coords, cfg.corr_radius
                )
        else:
            corr = all_pairs_correlation(fmap1, fmap2)
            pyramid = build_corr_pyramid(corr, cfg.corr_levels)

            def lookup(coords):
                return corr_lookup(pyramid, coords, cfg.corr_radius)

        cmap = cnet(img1)
        net = jnp.tanh(cmap[..., :hdim])
        inp = nn.relu(cmap[..., hdim:])

        b, h8, w8, _ = fmap1.shape
        coords0 = coords_grid(b, h8, w8)
        coords1 = coords_grid(b, h8, w8)
        if flow_init is not None:
            coords1 = coords1 + flow_init

        # Recurrent refinement as ONE lax.scan over iterations (shared
        # params via nn.scan variable_broadcast) — the unrolled Python loop
        # the reference uses (core/raft.py:102-127) would inline the update
        # block `iters` times into the HLO, blowing up XLA compile time.
        # In test mode only the final upsampled flow is carried, so no
        # [iters, B, H, W, 2] stack ever materialises on device.
        update_cls = SmallUpdateBlock if cfg.small else BasicUpdateBlock

        def step(mdl, carry, _):
            net, coords1, _ = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr_feat = lookup(coords1)
            flow = (coords1 - coords0).astype(dt)
            upd = update_cls(cfg, name="update_block", parent=mdl)
            net, up_mask, delta = upd(net, inp, corr_feat.astype(dt), flow)
            coords1 = coords1 + delta.astype(jnp.float32)
            if up_mask is None:
                flow_up = upflow8(coords1 - coords0)
            else:
                flow_up = upsample_flow_convex(
                    coords1 - coords0, up_mask.astype(jnp.float32)
                )
            carry = (net, coords1, flow_up)
            return carry, (None if test_mode else flow_up)

        flow0 = jnp.zeros((b, h8 * 8, w8 * 8, 2), jnp.float32)
        body = nn.remat(step, prevent_cse=False) if cfg.remat else step
        (net, coords1, flow_up), stacked = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=iters,
        )(self, (net, coords1, flow0), None)

        if test_mode:
            return coords1 - coords0, flow_up
        return [stacked[i] for i in range(iters)]


def forward_interpolate(flow) -> "np.ndarray":
    """Forward-splat a flow field onto the next frame's grid (the Sintel
    warm-start, core/utils/utils.py:26-54): each source pixel's flow lands
    at its displaced position and holes are filled by nearest-neighbour
    interpolation.  Host-side numpy/scipy (used once per frame between
    steps, not in the jit path)."""
    import numpy as onp
    from scipy.interpolate import griddata

    h, w = flow.shape[:2]
    dx, dy = flow[..., 0], flow[..., 1]
    ys, xs = onp.mgrid[0:h, 0:w]
    x1 = (xs + dx).reshape(-1)
    y1 = (ys + dy).reshape(-1)
    fx = dx.reshape(-1)
    fy = dy.reshape(-1)
    valid = (x1 > 0) & (x1 < w) & (y1 > 0) & (y1 < h)
    x1, y1, fx, fy = x1[valid], y1[valid], fx[valid], fy[valid]
    if x1.size == 0:
        return onp.zeros_like(flow)
    fx_i = griddata((x1, y1), fx, (xs, ys), method="nearest")
    fy_i = griddata((x1, y1), fy, (xs, ys), method="nearest")
    return onp.stack([fx_i, fy_i], axis=-1).astype(onp.float32)


def pad_to_multiple(img: Array, mult: int = 8) -> tuple[Array, tuple]:
    """InputPadder equivalent (core/utils/utils.py:7-24): replicate-pad H/W
    up to a multiple of ``mult``; returns (padded, (top, bottom, left,
    right)) for later cropping."""
    h, w = img.shape[-3:-1] if img.ndim == 4 else img.shape[:2]
    ph = (-h) % mult
    pw = (-w) % mult
    pads = (ph // 2, ph - ph // 2, pw // 2, pw - pw // 2)
    cfgs = [(0, 0)] * img.ndim
    axis0 = img.ndim - 3 if img.ndim >= 3 else 0
    cfgs[axis0] = (pads[0], pads[1])
    cfgs[axis0 + 1] = (pads[2], pads[3])
    return jnp.pad(img, cfgs, mode="edge"), pads


def unpad(x: Array, pads: tuple) -> Array:
    t, bpad, l, r = pads
    h = x.shape[-3]
    w = x.shape[-2]
    return x[..., t : h - bpad or None, l : w - r or None, :]
