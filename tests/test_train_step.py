"""Stage-5 tests: training step semantics (accumulation trigger, warmup LR),
toy convergence, and sharded execution on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from emg_tpu.config import ModelConfig, TrainConfig
from emg_tpu.data.batching import PackedBatch
from emg_tpu.models import EMGModel
from emg_tpu.parallel import make_mesh, make_train_step, make_eval_step, shard_params
from emg_tpu.train.state import create_train_state, warmup_lr

RNG = np.random.default_rng(3)


def tiny_model():
    return EMGModel(
        ModelConfig(
            model_size=16,
            feed_forward_layer_size=32,
            num_layers_encoder=1,
            num_layers_decoder=1,
            n_heads_encoder=2,
            n_heads_decoder=2,
            relative_distance=8,
            dropout_model=0.0,
            dropout_pos_emb=0.0,
        )
    )


def toy_batch(B=2, n_rows=2, chunk=64, S=8, seed=0):
    rng = np.random.default_rng(seed)
    frames_per_row = chunk // 8
    total = n_rows * frames_per_row
    lengths = np.full(B, total // B, np.int32)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)
    targets = np.full((B, S), 42, np.int64)
    for b in range(B):
        L = S - 2
        targets[b, 0] = 41
        targets[b, 1 : 1 + L] = rng.integers(0, 40, L)
        targets[b, 1 + L] = 40
    return PackedBatch(
        packed_raw=rng.normal(size=(n_rows, chunk, 8)).astype(np.float32),
        n_rows=np.int32(n_rows),
        lengths=lengths,
        offsets=offsets,
        targets=targets,
        target_lengths=np.full(B, S, np.int32),
        n_examples=np.int32(B),
    )


@pytest.fixture()
def setup():
    model = tiny_model()
    batch = toy_batch()
    cfg = TrainConfig(batch_size_grad=4, learning_rate=1e-3, learning_rate_warmup=10)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    state = create_train_state(variables["params"], variables["batch_stats"], cfg)
    return model, cfg, state, batch


def test_warmup_lr():
    cfg = TrainConfig(learning_rate=3e-4, learning_rate_warmup=1500)
    assert float(warmup_lr(cfg, jnp.asarray(0))) == pytest.approx(3e-4 / 1500)
    assert float(warmup_lr(cfg, jnp.asarray(1499))) == pytest.approx(3e-4)
    assert float(warmup_lr(cfg, jnp.asarray(10_000))) == pytest.approx(3e-4)


@pytest.mark.slow
def test_accumulation_trigger(setup):
    model, cfg, state, batch = setup
    step = make_train_step(model, cfg, max_frames=16)
    rng = jax.random.PRNGKey(0)
    # batch has 2 examples; batch_size_grad=4 -> apply on every 2nd microbatch
    s1, m1 = step(state, batch, rng)
    assert not bool(m1["applied"])
    assert int(s1.accum_examples) == 2
    p_before = np.asarray(jax.tree.leaves(s1.params)[0])  # copy before donation
    s2, m2 = step(s1, batch, rng)
    assert bool(m2["applied"])
    assert int(s2.accum_examples) == 0
    assert int(s2.updates) == 1
    p_after = np.asarray(jax.tree.leaves(s2.params)[0])
    assert not np.allclose(p_before, p_after)
    # accumulated grads are reset after apply
    assert float(jnp.abs(jax.tree.leaves(s2.accum_grads)[0]).max()) == 0.0


@pytest.mark.slow
def test_toy_convergence(setup):
    model, cfg, state, batch = setup
    step = make_train_step(model, cfg, max_frames=16)
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(60):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, f"no descent: {losses[0]} -> {losses[-1]}"


def test_eval_step_deterministic(setup):
    model, cfg, state, batch = setup
    ev = make_eval_step(model, cfg, max_frames=16)
    m1 = ev(state.params, state.batch_stats, batch)
    m2 = ev(state.params, state.batch_stats, batch)
    assert float(m1["loss"]) == float(m2["loss"])
    assert np.isfinite(float(m1["loss"]))


@pytest.mark.slow
def test_sharded_train_step_8dev():
    """Full train step over a (4 data, 2 model) CPU mesh: shard params and
    batch, run two microbatches, verify an update applies and results stay
    finite — validating the tp/dp sharding rules compile and execute."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(data_axis=4, model_axis=2)
    model = tiny_model()
    batch = toy_batch(B=4, n_rows=4, chunk=64, S=8)
    cfg = TrainConfig(batch_size_grad=8, learning_rate=1e-3, learning_rate_warmup=10)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    with mesh:
        params = shard_params(variables["params"], mesh)
        state = create_train_state(params, variables["batch_stats"], cfg)
        sb = PackedBatch(
            packed_raw=jax.device_put(batch.packed_raw, NamedSharding(mesh, P("data", None, None))),
            n_rows=jax.device_put(batch.n_rows, NamedSharding(mesh, P())),
            lengths=jax.device_put(batch.lengths, NamedSharding(mesh, P("data"))),
            offsets=jax.device_put(batch.offsets, NamedSharding(mesh, P("data"))),
            targets=jax.device_put(batch.targets, NamedSharding(mesh, P("data", None))),
            target_lengths=jax.device_put(batch.target_lengths, NamedSharding(mesh, P("data"))),
            n_examples=jax.device_put(batch.n_examples, NamedSharding(mesh, P())),
        )
        step = make_train_step(model, cfg, max_frames=16)
        rng = jax.random.PRNGKey(0)
        s1, m1 = step(state, sb, rng)
        s2, m2 = step(s1, sb, rng)
    assert np.isfinite(float(m2["loss"]))
    assert bool(m2["applied"]) == (2 * 4 >= cfg.batch_size_grad)
    # a w_q param stays sharded over the model axis
    wq = s2.params["transformerEncoder"]["layer0"]["self_attn"]["w_q"]
    assert len(wq.sharding.device_set) > 1


@pytest.mark.slow
def test_bfloat16_compute_dtype():
    """bfloat16 transformer compute: train step runs and descends."""
    from emg_tpu.config import ModelConfig
    from emg_tpu.models import EMGModel

    model = EMGModel(
        ModelConfig(
            model_size=16, feed_forward_layer_size=32, num_layers_encoder=1,
            num_layers_decoder=1, n_heads_encoder=2, n_heads_decoder=2,
            relative_distance=8, dropout_model=0.0, dropout_pos_emb=0.0,
            compute_dtype="bfloat16",
        )
    )
    batch = toy_batch()
    cfg = TrainConfig(batch_size_grad=2, learning_rate=1e-3, learning_rate_warmup=5)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    state = create_train_state(variables["params"], variables["batch_stats"], cfg)
    step = make_train_step(model, cfg, max_frames=16)
    losses = []
    for _ in range(20):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_remat_encoder_trains():
    from emg_tpu.config import ModelConfig
    from emg_tpu.models import EMGModel

    model = EMGModel(
        ModelConfig(
            model_size=16, feed_forward_layer_size=32, num_layers_encoder=2,
            num_layers_decoder=1, n_heads_encoder=2, n_heads_decoder=2,
            relative_distance=8, dropout_model=0.0, dropout_pos_emb=0.0,
            remat=True,
        )
    )
    batch = toy_batch()
    cfg = TrainConfig(batch_size_grad=2, learning_rate=1e-3, learning_rate_warmup=5)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    state = create_train_state(variables["params"], variables["batch_stats"], cfg)
    step = make_train_step(model, cfg, max_frames=16)
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_fused_window_matches_per_microbatch(setup):
    """make_train_window (one launch per accumulation window — the path
    the Trainer runs with train.fused_window) reproduces the sequential
    per-microbatch steps exactly: same params, same counters, same RNG
    folding (each inlined body folds on the SAME microbatch counter), and
    the same per-microbatch metrics."""
    from emg_tpu.parallel.train_step import make_train_window

    model, cfg, state, _ = setup
    batches = [toy_batch(seed=s) for s in (1, 2, 3, 4, 5)]
    mfs = [16] * len(batches)
    rng = jax.random.PRNGKey(7)

    # both paths donate their state argument: give each its own copy
    copy = lambda s: jax.tree.map(lambda x: jnp.array(x), s)

    step = make_train_step(model, cfg, max_frames=16)
    s_seq = copy(state)
    seq_metrics = []
    for b in batches:
        s_seq, m = step(s_seq, b, rng)
        seq_metrics.append(m)

    window = make_train_window(model, cfg, mfs)
    s_win, win_metrics = window(copy(state), tuple(batches), rng)

    assert int(s_win.microbatches) == int(s_seq.microbatches) == 5
    assert int(s_win.updates) == int(s_seq.updates)
    assert int(s_win.accum_examples) == int(s_seq.accum_examples)
    for a, b in zip(jax.tree.leaves(s_win.params), jax.tree.leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s_win.batch_stats),
                    jax.tree.leaves(s_seq.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for mw, ms in zip(win_metrics, seq_metrics):
        assert float(mw["loss"]) == pytest.approx(float(ms["loss"]), rel=1e-6)
        assert bool(mw["applied"]) == bool(ms["applied"])


@pytest.mark.slow
def test_trainer_window_plan():
    """Window boundaries: cut at each optimizer apply (accumulated example
    count reaching batch_size_grad, carrying the resume-time remainder),
    at report_loss boundaries, and at the length cap; the plan always
    covers the epoch exactly."""
    from emg_tpu.train.trainer import Trainer

    cfg = TrainConfig(batch_size_grad=8, report_loss=50)
    # 2 examples per microbatch -> apply every 4th
    batches = [[0, 1]] * 10
    plan = Trainer._plan_windows(batches, 0, cfg)
    assert plan == [4, 4, 2]
    # resume mid-accumulation: 6 examples already pending -> first apply
    # after just one more microbatch
    plan = Trainer._plan_windows(batches, 6, cfg)
    assert plan == [1, 4, 4, 1]
    # report_loss boundary splits a window
    cfg = TrainConfig(batch_size_grad=100, report_loss=3)
    plan = Trainer._plan_windows(batches, 0, cfg)
    assert plan == [3, 3, 3, 1]
    assert sum(plan) == len(batches)


def test_fused_adamw_matches_torch():
    """fused_adamw (one HBM pass per leaf) is numerically torch.optim.AdamW
    — the reference optimizer (recognition_model.py:293) — and optax.adamw,
    over several steps with a per-step LR change through the hyperparams
    interface."""
    import optax
    torch = pytest.importorskip("torch")

    from emg_tpu.train.state import fused_adamw

    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(24, 16)).astype(np.float32)
    grads = [rng.normal(size=p0.shape).astype(np.float32) for _ in range(4)]
    lrs = [3e-4, 3e-4, 1e-3, 5e-4]

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.AdamW([tp], lr=lrs[0], betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=0.01)
    for g, lr in zip(grads, lrs):
        for group in topt.param_groups:
            group["lr"] = lr
        tp.grad = torch.tensor(g)
        topt.step()

    tx = fused_adamw(lrs[0])
    params = {"w": jnp.asarray(p0)}
    st = tx.init(params)
    for g, lr in zip(grads, lrs):
        st = st._replace(hyperparams={"learning_rate": jnp.float32(lr)})
        upd, st = tx.update({"w": jnp.asarray(g)}, st, params)
        params = optax.apply_updates(params, upd)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=2e-5, atol=2e-6
    )


def test_int16_staging(setup):
    """int16-staged batches (data/batching.quantize_packed_raw) dequantize
    on device inside the train step; losses match float32 staging to the
    quantization-noise level and the round trip is bounded by the scale."""
    from emg_tpu.data.batching import (
        RAW_INT16_SCALE,
        dequantize_packed_raw,
        quantize_packed_raw,
    )

    model, cfg, state, batch = setup
    q = quantize_packed_raw(batch)
    assert q.packed_raw.dtype == np.int16
    assert quantize_packed_raw(q) is q  # idempotent
    back = np.asarray(dequantize_packed_raw(jax.tree.map(jnp.asarray, q)).packed_raw)
    assert np.abs(back - batch.packed_raw).max() <= 0.5 / RAW_INT16_SCALE + 1e-7
    # the PAD fill value round-trips to ~42 (BN-stat noise level)
    pad = float(np.asarray(dequantize_packed_raw(
        quantize_packed_raw(PackedBatch(
            packed_raw=np.full((1, 8, 8), 42.0, np.float32),
            n_rows=np.int32(1), lengths=np.ones(1, np.int32),
            offsets=np.zeros(1, np.int32),
            targets=np.full((1, 4), 42, np.int64),
            target_lengths=np.full(1, 4, np.int32), n_examples=np.int32(1),
        ))).packed_raw)[0, 0, 0])
    assert abs(pad - 42.0) < 1e-3

    step = make_train_step(model, cfg, max_frames=16)
    rng = jax.random.key(0, impl="rbg")
    import copy

    state_f = jax.tree.map(jnp.array, state)
    state_q = jax.tree.map(jnp.array, state)
    state_f, m_f = step(state_f, batch, rng)
    state_q, m_q = step(state_q, q, rng)
    assert float(m_q["loss"]) == pytest.approx(float(m_f["loss"]), rel=1e-3)


def test_fused_window_auto_resolution():
    """TrainConfig.fused_window None=auto: off on CPU-only backends (each
    distinct window signature pays a slow XLA:CPU compile — the
    reference-scale drill measured ~18 s/microbatch), on for accelerator
    attachments; explicit True/False always wins. Also covers the CLI
    tri-state coercion."""
    from emg_tpu.config import Config, _coerce
    from emg_tpu.train.trainer import Trainer

    t = Trainer.__new__(Trainer)
    t.config = Config()
    assert t.config.train.fused_window is None
    assert t._fused_window_enabled() is False  # tests force JAX_PLATFORMS=cpu
    t.config.train.fused_window = True
    assert t._fused_window_enabled() is True
    t.config.train.fused_window = False
    assert t._fused_window_enabled() is False

    assert _coerce("true", None) is True
    assert _coerce("off", None) is False
    assert _coerce("auto", None) is None

    cfg = Config.from_args(["--train.fused_window", "false"])
    assert cfg.train.fused_window is False
