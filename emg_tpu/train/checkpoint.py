"""Checkpointing: full train state via orbax, with best-metric retention.

Upgrade over the reference's torch.save of model weights only
(recognition_model.py:310-312 — no optimizer/step/epoch state, no resume):
we persist params, batch stats, optimizer state, and counters, keep a
separate ``best`` checkpoint when the dev PER improves, and can restore
either for resume or for evaluation.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from emg_tpu.train.state import TrainState


def _restore_opt_state(saved: Any, template: Any) -> Any:
    """Rebuild the live opt_state from a restored checkpoint tree BY NAME.

    orbax's PyTreeCheckpointer returns plain nested dicts; unflattening
    those leaves positionally into the live NamedTuple would silently
    depend on the NamedTuple's field order matching the dict's sorted-key
    order, and would break outright (leaf-count mismatch) on checkpoints
    saved before fused_adamw replaced the optax inject_hyperparams(adamw)
    chain. Both layouts carry ``count``/``mu``/``nu`` (ScaleByAdamState
    inside the legacy chain) and a ``hyperparams`` dict with
    ``learning_rate`` somewhere in their tree, so we locate them by key.
    Falls back to positional unflattening for unrecognized layouts."""
    from emg_tpu.train.state import FusedAdamWState

    def find(tree, *keys):
        """Depth-first: the first dict carrying every key in ``keys``."""
        if isinstance(tree, dict):
            if all(k in tree for k in keys):
                return tree
            for v in tree.values():
                hit = find(v, *keys)
                if hit is not None:
                    return hit
        elif isinstance(tree, (list, tuple)):
            for v in tree:
                hit = find(v, *keys)
                if hit is not None:
                    return hit
        return None

    if isinstance(template, FusedAdamWState):
        adam = find(saved, "mu", "nu")
        hyper = find(saved, "learning_rate")
        if adam is not None and hyper is not None:
            return FusedAdamWState(
                count=jax.numpy.asarray(adam["count"], jax.numpy.int32),
                hyperparams={"learning_rate": jax.numpy.asarray(
                    hyper["learning_rate"], jax.numpy.float32)},
                mu=adam["mu"],
                nu=adam["nu"],
            )
    return jax.tree.unflatten(
        jax.tree.structure(template), jax.tree.leaves(saved)
    )


def _state_tree(state: TrainState) -> dict:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "accum_grads": state.accum_grads,
        "accum_examples": state.accum_examples,
        "microbatches": state.microbatches,
        "updates": state.updates,
    }


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: TrainState, name: str = "latest", extra: Optional[dict] = None):
        tree = _state_tree(state)
        if extra:
            tree["extra"] = extra
        path = self._path(name)
        self._ckpt.save(path, jax.tree.map(np.asarray, tree), force=True)

    def save_params(self, params, batch_stats, name: str = "model"):
        """Weights-only checkpoint (the reference's model.pt analogue)."""
        self._ckpt.save(
            self._path(name),
            {"params": jax.tree.map(np.asarray, params),
             "batch_stats": jax.tree.map(np.asarray, batch_stats)},
            force=True,
        )

    def restore_params(self, name: str = "model") -> Tuple[Any, Any]:
        tree = self._ckpt.restore(self._path(name))
        return tree["params"], tree["batch_stats"]

    def restore(self, state: TrainState, name: str = "latest") -> Tuple[TrainState, dict]:
        """Restore into an existing (template) state; returns (state, extra)."""
        template = _state_tree(state)
        template["extra"] = {}
        tree = self._ckpt.restore(self._path(name))
        extra = tree.pop("extra", {})
        return (
            state.replace(
                params=tree["params"],
                batch_stats=tree["batch_stats"],
                opt_state=_restore_opt_state(tree["opt_state"], state.opt_state),
                accum_grads=tree["accum_grads"],
                accum_examples=tree["accum_examples"],
                microbatches=tree["microbatches"],
                updates=tree["updates"],
            ),
            extra,
        )

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))
