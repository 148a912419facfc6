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
                opt_state=jax.tree.unflatten(
                    jax.tree.structure(state.opt_state),
                    jax.tree.leaves(tree["opt_state"]),
                ),
                accum_grads=tree["accum_grads"],
                accum_examples=tree["accum_examples"],
                microbatches=tree["microbatches"],
                updates=tree["updates"],
            ),
            extra,
        )

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))
