"""Sharded RAFT training step: dp over 'data', tp over 'model'.

Replaces the reference's thread-based ``nn.DataParallel`` training loop
(codebase/RAFT/train.py:136-214) with jit + NamedSharding: inputs sharded
over 'data', large conv kernels tensor-sharded over 'model'; XLA GSPMD
inserts gradient psums and activation all-gathers over ICI automatically.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nsof_tpu.models.raft import RAFT, RaftConfig
from nsof_tpu.parallel.mesh import shard_params_conv_tp
from nsof_tpu.train.loss import flowformer_sequence_loss, sequence_loss
from nsof_tpu.train.optim import flowformer_optimizer, raft_optimizer


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    rng,
    mesh: Mesh,
    cfg: RaftConfig = RaftConfig(),
    image_hw: tuple[int, int] = (64, 64),
    lr: float = 4e-4,
    num_steps: int = 100_000,
    tp_min_features: int = 128,
):
    """Initialise sharded params + optimizer state on the mesh.

    ``tp_min_features`` sets the smallest out-feature dim that gets
    tensor-sharded over 'model' (lower it for small configs so the model
    axis is actually exercised).
    """
    model = RAFT(cfg)
    h, w = image_hw
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)

    def init_fn(rng):
        return model.init(rng, dummy, dummy, iters=1)["params"]

    abstract = jax.eval_shape(init_fn, rng)
    shardings = shard_params_conv_tp(abstract, mesh, min_features=tp_min_features)
    params = jax.jit(init_fn, out_shardings=shardings)(rng)

    tx = raft_optimizer(lr=lr, num_steps=num_steps)
    opt_state = jax.jit(
        tx.init,
        out_shardings=jax.tree.map(
            lambda _: NamedSharding(mesh, P()), jax.eval_shape(tx.init, abstract)
        ),
    )(params)
    # note: optimizer moments inherit param shapes; replicate the scalar
    # state, shard the moments like the params
    return model, tx, TrainState(params, opt_state, jnp.zeros((), jnp.int32))


def make_train_step(model: RAFT, tx: optax.GradientTransformation,
                    mesh: Mesh, iters: int = 12, gamma: float = 0.8):
    """Returns jitted train_step(state, batch) with dp/tp shardings.

    batch: dict with image1/image2 [B, H, W, 3], flow [B, H, W, 2],
    valid [B, H, W]; batch dims sharded over 'data'.
    """
    data = NamedSharding(mesh, P("data"))

    @partial(jax.jit, donate_argnums=(0,),
             in_shardings=(None, data), out_shardings=None)
    def train_step(state: TrainState, batch):
        def loss_fn(params):
            preds = model.apply(
                {"params": params}, batch["image1"], batch["image2"],
                iters=iters,
            )
            loss, metrics = sequence_loss(
                preds, batch["flow"], batch["valid"], gamma
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        metrics = dict(metrics, loss=loss)
        return new_state, metrics

    return train_step


def create_flowformer_state(
    rng,
    mesh: Mesh,
    cfg=None,
    image_hw: tuple[int, int] = (96, 128),
    lr: float | None = None,
    num_steps: int | None = None,
    twins_lr_factor: float | None = None,
):
    """Sharded FlowFormer training state: data-parallel only (the
    reference trains it with DataParallel, train_FlowFormer.py:57);
    params replicated over the mesh.  ``twins_lr_factor`` trains the
    twins backbones at a reduced lr (optimizer/__init__.py:22-33)."""
    from nsof_tpu.models.flowformer import FlowFormer, FlowFormerConfig

    cfg = cfg or FlowFormerConfig()
    model = FlowFormer(cfg)
    h, w = image_hw
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)

    def init_fn(rng):
        return model.init(rng, dummy, dummy)["params"]

    repl = NamedSharding(mesh, P())
    abstract = jax.eval_shape(init_fn, rng)
    params = jax.jit(
        init_fn, out_shardings=jax.tree.map(lambda _: repl, abstract)
    )(rng)
    tx = flowformer_optimizer(
        lr=cfg.canonical_lr if lr is None else lr,
        num_steps=cfg.num_steps if num_steps is None else num_steps,
        wdecay=cfg.adamw_decay,
        eps=cfg.epsilon,
        clip=cfg.clip,
        twins_lr_factor=twins_lr_factor,
    )
    opt_state = jax.jit(
        tx.init,
        out_shardings=jax.tree.map(
            lambda _: repl, jax.eval_shape(tx.init, abstract)
        ),
    )(params)
    return model, tx, TrainState(params, opt_state, jnp.zeros((), jnp.int32))


def make_flowformer_step(model, tx, mesh: Mesh, gamma: float = 0.8):
    """jitted FlowFormer train_step(state, batch), batch sharded over
    'data' (same contract as make_train_step)."""
    data = NamedSharding(mesh, P("data"))

    @partial(jax.jit, donate_argnums=(0,),
             in_shardings=(None, data), out_shardings=None)
    def train_step(state: TrainState, batch):
        def loss_fn(params):
            preds = model.apply(
                {"params": params}, batch["image1"], batch["image2"]
            )
            loss, metrics = flowformer_sequence_loss(
                preds, batch["flow"], batch["valid"], gamma
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)
