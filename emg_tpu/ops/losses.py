"""Decoder CE loss with the reference's nonstandard label smoothing.

The reference LabelSmoothingLoss (LabelSmoothingLoss.py:7-15) is NOT
classic uniform smoothing: it is
    (1 - eps) * CE(ignore_index=PAD)  +  (eps / S) * sum(exp(logits))
where S is the (padded) target sequence length and the exp-sum runs over
every position and class including padding — a logit-magnitude regularizer.
Both quirks are reproduced. The combined objective is
    loss = (1 - alpha) * dec + alpha * enc  (recognition_model.py:107).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emg_tpu.text.phonemes import PAD_ID


def label_smoothing_loss(
    logits: jnp.ndarray,  # (B, S, C)
    targets: jnp.ndarray,  # (B, S)
    epsilon: float = 0.1,
    pad_id: int = PAD_ID,
    batch_mask: jnp.ndarray = None,  # (B,) True for real examples
    seq_len=None,  # true (unbucketed) max target length in the batch
) -> jnp.ndarray:
    B, S, C = logits.shape
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe_targets = jnp.where(targets == pad_id, 0, targets)
    nll = -jnp.take_along_axis(logp, safe_targets[:, :, None], axis=-1)[:, :, 0]
    valid = targets != pad_id
    if batch_mask is not None:
        valid = valid & batch_mask[:, None]
    count = jnp.maximum(jnp.sum(valid), 1).astype(logits.dtype)
    ce = jnp.sum(jnp.where(valid, nll, 0.0)) / count

    # the exp regularizer covers every position/class of the true batch —
    # including PAD positions inside the true sequence length — but not the
    # bucketing padding (which does not exist in the reference)
    pos_valid = jnp.ones((B, S), bool)
    if seq_len is not None:
        pos_valid = pos_valid & (jnp.arange(S)[None, :] < seq_len)
    if batch_mask is not None:
        pos_valid = pos_valid & batch_mask[:, None]
    exp_sum = jnp.sum(jnp.where(pos_valid[:, :, None], jnp.exp(logits), 0.0))
    denom = (jnp.asarray(seq_len, logits.dtype) if seq_len is not None else S)
    reg = (epsilon / denom) * exp_sum
    return (1.0 - epsilon) * ce + reg


def combined_loss(dec_loss: jnp.ndarray, enc_loss: jnp.ndarray, alpha: float = 0.2):
    return (1.0 - alpha) * dec_loss + alpha * enc_loss
