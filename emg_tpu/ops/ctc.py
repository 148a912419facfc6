"""CTC loss with torch-compatible semantics on TPU.

The reference computes F.ctc_loss(log_probs, targets, input_lengths,
target_lengths, blank=43) with the default 'mean' reduction — the batch
mean of per-sequence negative log-likelihood divided by target length
(reference recognition_model.py:93-98; targets are the phoneme ids with
<S>/</S> stripped). Forward-backward runs via optax's log-semiring scan,
which XLA compiles to an on-device loop over time.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from emg_tpu.text.phonemes import BLANK_ID


def ctc_loss(
    log_probs: jnp.ndarray,  # (B, T, C) log-softmaxed (or raw) logits
    input_lengths: jnp.ndarray,  # (B,)
    targets: jnp.ndarray,  # (B, S) target ids, no blanks
    target_lengths: jnp.ndarray,  # (B,)
    blank: int = BLANK_ID,
    reduction: str = "mean",
    batch_mask: jnp.ndarray = None,  # (B,) True for real examples
) -> jnp.ndarray:
    """torch.nn.functional.ctc_loss semantics (reduction='mean').

    ``batch_mask`` excludes bucket-padding examples from the reduction.
    """
    B, T, C = log_probs.shape
    t = jnp.arange(T)[None, :]
    logit_paddings = (t >= input_lengths[:, None]).astype(jnp.float32)
    s = jnp.arange(targets.shape[1])[None, :]
    label_paddings = (s >= target_lengths[:, None]).astype(jnp.float32)
    # optax applies log_softmax internally; log_softmax is idempotent so
    # passing already-normalized log-probs matches torch's contract
    labels = jnp.where(label_paddings > 0, 0, targets).astype(jnp.int32)
    per_seq = optax.ctc_loss(
        log_probs, logit_paddings, labels, label_paddings, blank_id=blank
    )
    if reduction not in ("none", "mean", "sum"):
        raise ValueError(f"unknown reduction {reduction}")
    if reduction == "none":
        return per_seq
    if reduction == "sum":
        if batch_mask is not None:
            per_seq = jnp.where(batch_mask, per_seq, 0.0)
        return jnp.sum(per_seq)
    denom = jnp.maximum(target_lengths, 1).astype(per_seq.dtype)
    per_seq = per_seq / denom
    if batch_mask is not None:
        per_seq = jnp.where(batch_mask, per_seq, 0.0)
        count = jnp.maximum(jnp.sum(batch_mask), 1).astype(per_seq.dtype)
        return jnp.sum(per_seq) / count
    return jnp.mean(per_seq)
