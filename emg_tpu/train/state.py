"""Training state: params + batch stats + AdamW with warmup + grad accumulation.

Reproduces the reference's optimizer semantics (recognition_model.py:52-118,
293): AdamW over all parameters (torch defaults: betas 0.9/0.999, eps 1e-8,
weight decay 0.01 applied to every tensor), linear LR warmup over the first
1500 *microbatches* (the reference schedules on the per-batch counter, not
the optimizer-step counter), and gradient accumulation that sums raw
per-microbatch gradients and applies an update once the accumulated example
count reaches batch_size_grad.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from emg_tpu.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    accum_grads: Any
    accum_examples: jnp.ndarray  # () int32 — examples since last apply
    microbatches: jnp.ndarray  # () int32 — lifetime microbatch counter
    updates: jnp.ndarray  # () int32 — optimizer apply count
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    cfg: TrainConfig = flax.struct.field(pytree_node=False)


def warmup_lr(cfg: TrainConfig, microbatches: jnp.ndarray) -> jnp.ndarray:
    """Reference schedule_lr: lr ramps linearly over the first
    learning_rate_warmup microbatches, then stays at learning_rate."""
    it = jnp.minimum(microbatches.astype(jnp.float32) + 1.0, float(cfg.learning_rate_warmup))
    return it * cfg.learning_rate / cfg.learning_rate_warmup


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.learning_rate,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=0.01,
    )


def create_train_state(params, batch_stats, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        accum_grads=zeros,
        accum_examples=jnp.zeros((), jnp.int32),
        microbatches=jnp.zeros((), jnp.int32),
        updates=jnp.zeros((), jnp.int32),
        tx=tx,
        cfg=cfg,
    )
