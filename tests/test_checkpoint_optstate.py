"""Optimizer-state checkpoint restore: layout robustness.

CheckpointManager.restore rebuilds the live FusedAdamWState from orbax's
plain-dict tree BY FIELD NAME (train/checkpoint.py:_restore_opt_state), so
(a) the NamedTuple's field order is not load-bearing, and (b) checkpoints
written before fused_adamw replaced the optax inject_hyperparams(adamw)
chain still restore — their ScaleByAdamState's count/mu/nu and the
injected learning_rate are located by key inside the legacy structure
(ADVICE r3, train/state.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from emg_tpu.config import TrainConfig
from emg_tpu.train.checkpoint import CheckpointManager
from emg_tpu.train.state import FusedAdamWState, create_train_state


def _toy_params():
    return {
        "dense": {"kernel": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                  "bias": jnp.ones((3,), jnp.float32)},
        "emb": {"embedding": jnp.full((4, 2), 0.5, jnp.float32)},
    }


def _stats():
    return {"bn": {"mean": jnp.zeros((3,)), "var": jnp.ones((3,))}}


def test_fused_opt_state_round_trip(tmp_path):
    cfg = TrainConfig()
    state = create_train_state(_toy_params(), _stats(), cfg)
    # make mu/nu distinguishable from zeros and from each other
    state = state.replace(opt_state=state.opt_state._replace(
        count=jnp.int32(7),
        mu=jax.tree.map(lambda p: p + 1.0, state.params),
        nu=jax.tree.map(lambda p: p + 2.0, state.params),
        hyperparams={"learning_rate": jnp.float32(3e-4)},
    ))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(state, "latest", extra={"epoch": 1})

    fresh = create_train_state(_toy_params(), _stats(), cfg)
    restored, extra = mgr.restore(fresh, "latest")
    opt = restored.opt_state
    assert isinstance(opt, FusedAdamWState)
    assert int(opt.count) == 7
    assert float(opt.hyperparams["learning_rate"]) == pytest.approx(3e-4)
    for got, want in zip(jax.tree.leaves(opt.mu),
                         jax.tree.leaves(state.opt_state.mu)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(jax.tree.leaves(opt.nu),
                         jax.tree.leaves(state.opt_state.nu)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_legacy_inject_hyperparams_opt_state_restores(tmp_path):
    """A checkpoint whose opt_state is the r2-era
    optax.inject_hyperparams(optax.adamw) layout restores into today's
    FusedAdamWState with matching count/mu/nu/learning_rate."""
    cfg = TrainConfig()
    params = _toy_params()
    legacy_tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.learning_rate
    )
    legacy_opt = legacy_tx.init(params)
    # advance it a few steps so count/mu/nu are non-trivial
    grads = jax.tree.map(lambda p: 0.1 * jnp.ones_like(p), params)
    for _ in range(3):
        _, legacy_opt = legacy_tx.update(grads, legacy_opt, params)

    state = create_train_state(params, _stats(), cfg)
    # write the checkpoint with the LEGACY opt_state in place
    legacy_state = state.replace(opt_state=legacy_opt)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(legacy_state, "latest", extra={"epoch": 2})

    fresh = create_train_state(params, _stats(), cfg)
    restored, extra = mgr.restore(fresh, "latest")
    opt = restored.opt_state
    assert isinstance(opt, FusedAdamWState)
    adam = legacy_opt.inner_state[0]
    assert int(opt.count) == int(adam.count) == 3
    assert float(opt.hyperparams["learning_rate"]) == pytest.approx(
        float(legacy_opt.hyperparams["learning_rate"])
    )
    for got, want in zip(jax.tree.leaves(opt.mu), jax.tree.leaves(adam.mu)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    for got, want in zip(jax.tree.leaves(opt.nu), jax.tree.leaves(adam.nu)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
