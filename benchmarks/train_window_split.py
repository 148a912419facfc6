"""Decompose the accumulation window's device time (VERDICT r4 item 3).

The r4 accum-window MFU plateaued at ~41% pre-staged. This probe splits
one window into separately-timed programs over the SAME microbatches to
localize the non-matmul milliseconds:

  fwd        loss forward only (both heads + CTC + CE)
  grad       value_and_grad (no optimizer)          -> backward = grad - fwd
  full       the real fused window                  -> optimizer = full - grad
  encode     encoder stack only (CNN + transformer)
  ctc        CTC loss given encoder logits (recomputed encode, subtracted)

Ideal grad/fwd is ~3x (backward ~2x forward FLOPs); a larger ratio means
backward-inflating ops (BN stats, decollate scatters). Run:
python benchmarks/train_window_split.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from emg_tpu.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from emg_tpu.config import ModelConfig, TrainConfig  # noqa: E402
from emg_tpu.models import EMGModel  # noqa: E402
from emg_tpu.parallel.train_step import compute_losses, make_train_window  # noqa: E402
from emg_tpu.train.state import create_train_state  # noqa: E402


def timed(fn, args, reps=7):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best * 1000.0, out


def main():
    from collections import defaultdict

    from emg_tpu.data.batching import FRAME_BUCKETS, PackedBatch, bucket_up

    _, _, geo, _, _, _ = bench.build_greedy_pipeline()
    frames8 = [int(f) for f in geo["lengths"]]
    reps = 13
    frames = list(frames8) * reps
    groups = defaultdict(list)
    for f in frames:
        groups[bucket_up(f, FRAME_BUCKETS)].append(f)

    cfg = ModelConfig(compute_dtype="bfloat16")
    model = EMGModel(cfg)
    tcfg = TrainConfig(batch_size_grad=len(frames))
    rng = np.random.default_rng(0)
    S = 48

    batches = []
    total_fwd_flops = 0.0
    for bucket in sorted(groups):
        g = groups[bucket]
        geo = bench.packed_geometry(g)
        tlens = np.minimum(12 + geo["lengths"] // 16, S).astype(np.int32)
        targets = np.full((len(g), S), 42, np.int64)
        for i, L in enumerate(tlens):
            targets[i, 0] = 41
            targets[i, 1 : L - 1] = rng.integers(0, 40, L - 2)
            targets[i, L - 1] = 40
        b = bench.make_batch(geo, targets, tlens)
        b = PackedBatch(
            packed_raw=rng.normal(size=b.packed_raw.shape).astype(np.float32),
            n_rows=b.n_rows, lengths=b.lengths, offsets=b.offsets,
            targets=b.targets, target_lengths=b.target_lengths,
            n_examples=b.n_examples,
        )
        total_fwd_flops += bench.analytic_fwd_flops(
            cfg, rows=int(b.packed_raw.shape[0]), chunk=1600, B=len(g),
            T=bucket, S=S - 1, n_frames_total=int(geo["lengths"].sum()),
        )
        batches.append((jax.tree.map(jnp.asarray, b), bucket))

    b0, mf0 = batches[0]
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        b0.packed_raw, b0.n_rows, b0.offsets, b0.lengths,
        jnp.asarray(b0.targets[:, :-1]), mf0, False,
    )
    state = create_train_state(variables["params"], variables["batch_stats"], tcfg)
    key = jax.random.key(1, impl="rbg")
    bt = tuple(b for b, _ in batches)
    mfs = [mf for _, mf in batches]

    # --- full window (no donation: state reused across programs) -----------
    window = make_train_window(model, tcfg, mfs)

    def _consume(tree):
        # consume EVERY leaf: returning one leaf lets XLA dead-code-
        # eliminate the rest of the computation (measured: grad == fwd)
        return sum(jnp.sum(jnp.asarray(x, jnp.float32)) for x in jax.tree.leaves(tree))

    def full(state, bt):
        s2, ms = window(state, bt, key)
        return _consume(s2.params) + _consume(s2.opt_state) + _consume(ms)

    t_full, _ = timed(jax.jit(full), (state, bt))
    print({"full_window_ms": round(t_full, 2)}, flush=True)

    # --- forward only -------------------------------------------------------
    def loss_of(params, batch_stats, b, mf):
        (dec_loss, enc_loss), _ = compute_losses(
            model, params, batch_stats, b, mf,
            rngs={"dropout": jax.random.fold_in(key, 0),
                  "shift": jax.random.fold_in(key, 1)},
            train=True,
        )
        return 0.8 * dec_loss + 0.2 * enc_loss

    @jax.jit
    def fwd(params, batch_stats, bt):
        tot = 0.0
        for b, mf in zip(bt, mfs):
            tot = tot + loss_of(params, batch_stats, b, mf)
        return tot

    t_fwd, _ = timed(fwd, (state.params, state.batch_stats, bt))
    print({"fwd_ms": round(t_fwd, 2)}, flush=True)

    # --- grad (no optimizer) -------------------------------------------------
    _consume_g = _consume

    @jax.jit
    def grad(params, batch_stats, bt):
        g = None
        for b, mf in zip(bt, mfs):
            gi = jax.grad(lambda p: loss_of(p, batch_stats, b, mf))(params)
            g = gi if g is None else jax.tree.map(jnp.add, g, gi)
        return _consume(g)

    t_grad, _ = timed(grad, (state.params, state.batch_stats, bt))
    print({"grad_ms": round(t_grad, 2)}, flush=True)

    # --- encoder forward only ------------------------------------------------
    @jax.jit
    def enc_only(params, batch_stats, bt):
        tot = 0.0
        for b, mf in zip(bt, mfs):
            memory, enc_logits, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                b.packed_raw, b.n_rows, b.offsets, b.lengths, mf,
                train=False, method=model.encode,
            )
            tot = tot + _consume(memory) + _consume(enc_logits)
        return tot

    t_enc, _ = timed(enc_only, (state.params, state.batch_stats, bt))
    print({"encode_fwd_ms": round(t_enc, 2)}, flush=True)

    # --- encoder forward, TRAIN mode (adds BN statistics + shift/dropout) ----
    @jax.jit
    def enc_train(params, batch_stats, bt):
        tot = 0.0
        for i, (b, mf) in enumerate(zip(bt, mfs)):
            (memory, enc_logits, _), upd = model.apply(
                {"params": params, "batch_stats": batch_stats},
                b.packed_raw, b.n_rows, b.offsets, b.lengths, mf,
                train=True, method=model.encode,
                rngs={"dropout": jax.random.fold_in(key, 2 * i),
                      "shift": jax.random.fold_in(key, 2 * i + 1)},
                mutable=["batch_stats"],
            )
            tot = tot + _consume(memory) + _consume(enc_logits) + _consume(upd)
        return tot

    t_enc_tr, _ = timed(enc_train, (state.params, state.batch_stats, bt))
    print({"encode_fwd_train_ms": round(t_enc_tr, 2)}, flush=True)

    # --- CNN subsampler only (conv_blocks + w_raw_in), eval and train --------
    def cnn_of(m, x, n_rows, running):
        return m.w_raw_in(m.conv_blocks(x, n_rows, use_running_average=running))

    @jax.jit
    def cnn_eval(params, batch_stats, bt):
        tot = 0.0
        for b, _ in zip(bt, mfs):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                b.packed_raw, b.n_rows, True, method=cnn_of,
            )
            tot = tot + _consume(out)
        return tot

    t_cnn, _ = timed(cnn_eval, (state.params, state.batch_stats, bt))
    print({"cnn_fwd_ms": round(t_cnn, 2)}, flush=True)

    @jax.jit
    def cnn_train(params, batch_stats, bt):
        tot = 0.0
        for b, _ in zip(bt, mfs):
            out, upd = model.apply(
                {"params": params, "batch_stats": batch_stats},
                b.packed_raw, b.n_rows, False, method=cnn_of,
                mutable=["batch_stats"],
            )
            tot = tot + _consume(out) + _consume(upd)
        return tot

    t_cnn_tr, _ = timed(cnn_train, (state.params, state.batch_stats, bt))
    print({"cnn_fwd_train_ms": round(t_cnn_tr, 2)}, flush=True)

    # --- per-component analytic FLOPs ----------------------------------------
    d, ff = cfg.model_size, cfg.feed_forward_layer_size
    M = cfg.relative_distance
    conv_flops = 0.0
    enc_flops = 0.0
    for b, bucket in batches:
        rows = int(b.packed_raw.shape[0])
        chunk = 1600
        t1, t2, t3 = chunk // 2, chunk // 4, chunk // 8
        conv = 0
        conv += 2 * t1 * (3 * 8 * d) + 2 * t1 * (3 * d * d) + 2 * t1 * (8 * d)
        conv += 2 * t2 * (3 * d * d) + 2 * t2 * (3 * d * d) + 2 * t2 * (d * d)
        conv += 2 * t3 * (3 * d * d) + 2 * t3 * (3 * d * d) + 2 * t3 * (d * d)
        conv_flops += conv * rows + 2 * rows * t3 * d * d  # + w_raw_in on rows
        B, T = int(b.offsets.shape[0]), bucket
        relw = min(2 * M - 1, 2 * T - 1)
        enc_layer = 8 * T * d * d + 4 * T * T * d + 2 * T * relw * d + 4 * T * d * ff
        enc_flops += cfg.num_layers_encoder * B * enc_layer + 2 * B * T * d * 44

    hw_flops = bench.chip_peak_flops()
    mfu_full = 3 * total_fwd_flops / (t_full / 1000.0) / hw_flops * 100

    def util(flops, ms):
        return round(flops / (ms / 1000.0) / hw_flops * 100, 1)

    print({
        "backward_ms": round(t_grad - t_fwd, 2),
        "optimizer_and_accum_ms": round(t_full - t_grad, 2),
        "grad_over_fwd": round(t_grad / t_fwd, 2),
        "fwd_analytic_tflops": round(total_fwd_flops / 1e12, 3),
        "mfu_full_pct": round(mfu_full, 2),
    }, flush=True)
    print({
        "cnn_analytic_gflops": round(conv_flops / 1e9, 1),
        "cnn_util_eval_pct": util(conv_flops, t_cnn),
        "cnn_util_train_pct": util(conv_flops, t_cnn_tr),
        "enc_transformer_ms_eval": round(t_enc - t_cnn, 2),
        "enc_transformer_util_pct": util(enc_flops, t_enc - t_cnn),
        "bn_stats_and_shift_ms": round(t_enc_tr - t_enc, 2),
        "decoder_and_losses_fwd_ms": round(t_fwd - t_enc_tr, 2),
    }, flush=True)


if __name__ == "__main__":
    main()
