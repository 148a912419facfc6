"""Jitted training/eval steps with gradient accumulation, in global view.

Loss wiring follows the reference training loop (recognition_model.py:77-118):
teacher inputs are targets[:, :-1], CE targets are targets[:, 1:], CTC labels
are the per-example phoneme ids stripped of <S>/</S> (realized as
targets[:, 1:] with label lengths - 2), CTC input lengths are the encoder
frame counts, and the two losses combine as (1-alpha)*dec + alpha*enc.
Gradients are summed across microbatches and applied once the accumulated
example count reaches batch_size_grad, at the warmup LR of the *microbatch*
counter — both quirks matching the reference exactly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from emg_tpu.data.batching import PackedBatch
from emg_tpu.ops import combined_loss, ctc_loss, label_smoothing_loss
from emg_tpu.text.phonemes import BLANK_ID, PAD_ID
from emg_tpu.train.state import TrainState, warmup_lr


def compute_losses(model, params, batch_stats, batch: PackedBatch, max_frames: int,
                   rngs=None, train: bool = False, tgt_in=None):
    """Returns ((loss, dec_loss, enc_loss), new_batch_stats)."""
    variables = {"params": params, "batch_stats": batch_stats}
    if tgt_in is None:
        tgt_in = batch.targets[:, :-1]
    ce_target = batch.targets[:, 1:]
    B = batch.targets.shape[0]
    batch_mask = jnp.arange(B) < batch.n_examples

    if train:
        out, updated = model.apply(
            variables,
            batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
            tgt_in, max_frames, True,
            rngs=rngs, mutable=["batch_stats"],
        )
        enc_logits, dec_logits = out
        new_bs = updated["batch_stats"]
    else:
        enc_logits, dec_logits = model.apply(
            variables,
            batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
            tgt_in, max_frames, False,
        )
        new_bs = batch_stats

    log_probs = jax.nn.log_softmax(enc_logits, axis=-1)
    enc_loss = ctc_loss(
        log_probs,
        batch.lengths,
        batch.targets[:, 1:],
        jnp.maximum(batch.target_lengths - 2, 0),
        blank=BLANK_ID,
        batch_mask=batch_mask,
    )
    true_S = jnp.max(batch.target_lengths) - 1  # teacher sequence length
    dec_loss = label_smoothing_loss(
        dec_logits, ce_target, epsilon=0.1, pad_id=PAD_ID,
        batch_mask=batch_mask, seq_len=true_S,
    )
    return (dec_loss, enc_loss), new_bs


def _augment_batch(batch: PackedBatch, cfg, rng) -> PackedBatch:
    """Device-side raw-EMG augmentations (training recipes; see
    emg_tpu.train.recipes): electrode rotation, channel drop, time drop."""
    packed = batch.packed_raw
    N, L, C = packed.shape
    r_rot, r_dir, r_chan, r_time, r_pos, r_len = jax.random.split(rng, 6)

    if cfg.electrode_rotation_prob > 0:
        do = jax.random.bernoulli(r_rot, cfg.electrode_rotation_prob)
        shift = jnp.where(jax.random.bernoulli(r_dir, 0.5), 1, -1)
        packed = jnp.where(do, jnp.roll(packed, shift, axis=2), packed)
    if cfg.channel_drop_prob > 0:
        keep = ~jax.random.bernoulli(r_chan, cfg.channel_drop_prob, (C,))
        packed = packed * keep[None, None, :].astype(packed.dtype)
    if cfg.time_drop_prob > 0:
        do = jax.random.bernoulli(r_time, cfg.time_drop_prob)
        total = N * L
        start = jax.random.randint(r_pos, (), 0, total)
        length = jax.random.randint(r_len, (), 1, cfg.time_drop_max_samples + 1)
        pos = jnp.arange(total)
        drop = (pos >= start) & (pos < start + length) & do
        packed = jnp.where(drop.reshape(N, L)[:, :, None], 0.0, packed)
    if packed is not batch.packed_raw:
        batch = PackedBatch(
            packed_raw=packed, n_rows=batch.n_rows, lengths=batch.lengths,
            offsets=batch.offsets, targets=batch.targets,
            target_lengths=batch.target_lengths, n_examples=batch.n_examples,
        )
    return batch


def make_train_step(model, cfg, max_frames: int):
    """Build the jitted microbatch step: grad, accumulate, maybe apply."""
    return jax.jit(make_train_step_fn(model, cfg, max_frames),
                   donate_argnums=(0,))


def make_train_window(model, cfg, max_frames_seq):
    """One jitted program running a whole accumulation WINDOW of
    microbatches (one per entry of ``max_frames_seq``, in order).

    Semantically identical to calling the per-microbatch step len(seq)
    times — same grads, same RNG folding, same apply trigger — but a
    single program launch. On dispatch-latency-bound attachments (the
    tunnel this repo benches through costs ~15-20 ms per launch even
    pipelined) this removes all but one launch per optimizer update; the
    microbatch composition of a window is known ahead of time because the
    DynamicBatchSampler is deterministic per (seed, epoch). One compile
    per distinct window signature (tuple of bucket shapes).
    """
    bodies = [make_train_step_fn(model, cfg, mf) for mf in max_frames_seq]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def window_step(state, batches, rng):
        metrics = []
        for body, batch in zip(bodies, batches):
            state, m = body(state, batch, rng)
            metrics.append(m)
        return state, metrics

    return window_step


def make_train_step_fn(model, cfg, max_frames: int):
    """The unjitted microbatch step body (see make_train_step)."""

    alpha = cfg.alpha_loss
    use_ss = cfg.scheduled_sampling_max_prob > 0
    use_aug = (
        cfg.electrode_rotation_prob > 0
        or cfg.channel_drop_prob > 0
        or cfg.time_drop_prob > 0
    )

    def loss_fn(params, batch_stats, batch, dropout_rng, shift_rng, ss_rng, ss_prob):
        tgt_in = None
        if use_ss:
            # parallel scheduled sampling: a first, gradient-free pass
            # produces token predictions; decoder inputs are replaced by
            # them with probability ss_prob (never the leading <S>)
            first_tgt = batch.targets[:, :-1]
            _, first_dec_logits = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
                first_tgt, max_frames, False,
            )
            preds = jnp.argmax(jax.lax.stop_gradient(first_dec_logits), axis=-1)
            # prediction for input position j is the model's output at j-1
            pred_inputs = jnp.concatenate([first_tgt[:, :1], preds[:, :-1]], axis=1)
            S1 = first_tgt.shape[1]
            mix = jax.random.bernoulli(ss_rng, ss_prob, (first_tgt.shape[0], S1))
            mix = mix & (jnp.arange(S1)[None, :] >= 1)
            tgt_in = jnp.where(mix, pred_inputs, first_tgt)

        (dec_loss, enc_loss), new_bs = compute_losses(
            model, params, batch_stats, batch, max_frames,
            rngs={"dropout": dropout_rng, "shift": shift_rng}, train=True,
            tgt_in=tgt_in,
        )
        loss = combined_loss(dec_loss, enc_loss, alpha)
        return loss, (dec_loss, enc_loss, new_bs)

    def train_step(state: TrainState, batch: PackedBatch, rng) -> Tuple[TrainState, dict]:
        # int16-staged batches (data.batching.quantize_packed_raw) carry the
        # raw rows at half the upload bytes; dequantize on device
        from emg_tpu.data.batching import dequantize_packed_raw

        batch = dequantize_packed_raw(batch)
        step_rng = jax.random.fold_in(rng, state.microbatches)
        dropout_rng, shift_rng, aug_rng, ss_rng = jax.random.split(step_rng, 4)
        if use_aug:
            batch = _augment_batch(batch, cfg, aug_rng)
        ss_prob = cfg.scheduled_sampling_max_prob * jnp.minimum(
            1.0, state.microbatches.astype(jnp.float32) / max(cfg.scheduled_sampling_ramp, 1)
        )
        (loss, (dec_loss, enc_loss, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, dropout_rng, shift_rng,
          ss_rng, ss_prob)
        accum = jax.tree.map(jnp.add, state.accum_grads, grads)
        n_accum = state.accum_examples + batch.n_examples
        lr = warmup_lr(state.cfg, state.microbatches)

        def do_apply(args):
            accum, opt_state, params = args
            hp = dict(opt_state.hyperparams)
            hp["learning_rate"] = lr
            opt_state = opt_state._replace(hyperparams=hp)
            updates, new_opt = state.tx.update(accum, opt_state, params)
            new_params = jax.tree.map(jnp.add, params, updates)
            zeros = jax.tree.map(jnp.zeros_like, accum)
            return new_params, new_opt, zeros, jnp.zeros((), jnp.int32)

        def no_apply(args):
            accum, opt_state, params = args
            return params, opt_state, accum, n_accum

        apply_now = n_accum >= state.cfg.batch_size_grad
        new_params, new_opt, new_accum, new_count = jax.lax.cond(
            apply_now, do_apply, no_apply, (accum, state.opt_state, state.params)
        )
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            accum_grads=new_accum,
            accum_examples=new_count,
            microbatches=state.microbatches + 1,
            updates=state.updates + apply_now.astype(jnp.int32),
        )
        metrics = {
            "loss": loss,
            "dec_loss": dec_loss,
            "enc_loss": enc_loss,
            "lr": lr,
            "applied": apply_now,
        }
        return new_state, metrics

    return train_step


def make_eval_step(model, cfg, max_frames: int):
    alpha = cfg.alpha_loss

    @jax.jit
    def eval_step(params, batch_stats, batch: PackedBatch) -> dict:
        (dec_loss, enc_loss), _ = compute_losses(
            model, params, batch_stats, batch, max_frames, train=False
        )
        return {
            "loss": combined_loss(dec_loss, enc_loss, alpha),
            "dec_loss": dec_loss,
            "enc_loss": enc_loss,
        }

    return eval_step
