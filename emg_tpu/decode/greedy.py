"""Batched greedy autoregressive decoding, device-resident.

Semantics match the reference run_greedy (greedy_search.py:7-53): start from
<S>, argmax the decoder's final position each step, keep extending the raw
argmax chain even after a sequence emits </S> (the reference's dec_input
grows with raw predictions), stop when every sequence has emitted </S> or
after target_len steps, and report each sequence cut at its first </S> with
<PAD> fill — the exact matrix used for the token-accuracy metric. The loop
is a jax.lax.while_loop over a fixed-size token buffer (early exit when all
sequences end), so the whole decode is one XLA program; ``num_steps`` may be
a traced scalar so one compilation serves every target-length bucket.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emg_tpu.data.batching import PackedBatch
from emg_tpu.text.phonemes import END_ID, PAD_ID, PHONEME_INVENTORY, START_ID


def greedy_decode(
    model,
    variables,
    batch: PackedBatch,
    max_frames: int,
    max_steps: int,
    num_steps=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (out_matrix (B, max_steps+1), raw_tokens (B, max_steps+1)).

    ``max_steps`` is the static buffer bound; ``num_steps`` (traced scalar,
    default = max_steps) is the actual decode-length limit — the reference's
    ``target_len`` bound. out_matrix is the reference's new_word_seq_idx:
    <S>, then the argmax chain cut at (and including) the first </S>, PAD
    elsewhere.
    """
    S = max_steps + 1  # +1 for the leading <S>
    if num_steps is None:
        num_steps = max_steps
    num_steps = jnp.asarray(num_steps, jnp.int32)

    memory, _, src_pad_mask = model.apply(
        variables,
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths, max_frames,
        train=False,
        method=model.encode,
    )
    B = memory.shape[0]

    def decode_step(tokens):
        return model.apply(
            variables, tokens, memory, src_pad_mask, False, method=model.decode
        )

    tokens0 = jnp.full((B, S), PAD_ID, jnp.int32).at[:, 0].set(START_ID)
    ended0 = jnp.zeros((B,), bool)

    def cond(carry):
        tokens, ended, s = carry
        return (s <= num_steps) & (s < S) & ~jnp.all(ended)

    def body(carry):
        tokens, ended, s = carry
        logits = decode_step(tokens)  # (B, S, 43)
        last = jax.lax.dynamic_index_in_dim(logits, s - 1, axis=1, keepdims=False)
        predicted = jnp.argmax(last, axis=-1).astype(jnp.int32)
        tokens = jnp.where(
            jnp.arange(S)[None, :] == s, predicted[:, None], tokens
        )
        ended = ended | (predicted == END_ID)
        return tokens, ended, s + 1

    tokens, ended, _ = jax.lax.while_loop(cond, body, (tokens0, ended0, jnp.int32(1)))

    # cut at first </S> (inclusive): positions after it become PAD
    is_end = tokens == END_ID
    first_end = jnp.where(jnp.any(is_end, axis=1), jnp.argmax(is_end, axis=1), S)
    pos = jnp.arange(S)[None, :]
    keep = pos <= first_end[:, None]
    out = jnp.where(keep, tokens, PAD_ID)
    return out, tokens


def greedy_decode_cached(
    model,
    variables,
    batch: PackedBatch,
    max_frames: int,
    max_steps: int,
    num_steps=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KV-cached greedy decode: identical outputs to ``greedy_decode`` at
    O(S) decoder cost per step instead of O(S^2) — the serving-path upgrade
    over the reference's full-prefix re-run (greedy_search.py:21, SURVEY.md
    §3.2 'no KV cache'). The XLA decode_step measured at HBM speed of light
    for its ~100 MB weight stream (0.20 ms/step at W=100, r5 marginal-timing
    probe), so there is no Pallas variant of this loop — the r3/r4 fused
    token-step kernels lost 2.6x to XLA and were retired (VALIDATION.md
    round 5)."""
    S = max_steps + 1
    if num_steps is None:
        num_steps = max_steps
    num_steps = jnp.asarray(num_steps, jnp.int32)

    memory, _, src_pad_mask = model.apply(
        variables,
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths, max_frames,
        train=False,
        method=model.encode,
    )
    B = memory.shape[0]
    cross_kvs = model.apply(variables, memory, method=model.project_cross_kvs)
    caches = model.init_decode_cache(B, S)

    tokens0 = jnp.full((B, S), PAD_ID, jnp.int32).at[:, 0].set(START_ID)
    ended0 = jnp.zeros((B,), bool)

    def cond(carry):
        tokens, ended, s, caches = carry
        return (s <= num_steps) & (s < S) & ~jnp.all(ended)

    def body(carry):
        tokens, ended, s, caches = carry
        token_in = jax.lax.dynamic_index_in_dim(tokens, s - 1, axis=1, keepdims=False)
        logits, caches = model.apply(
            variables, token_in, s - 1, caches, cross_kvs, tokens,
            src_pad_mask, method=model.decode_step,
        )
        predicted = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tokens = jnp.where(jnp.arange(S)[None, :] == s, predicted[:, None], tokens)
        ended = ended | (predicted == END_ID)
        return tokens, ended, s + 1, caches

    tokens, ended, _, _ = jax.lax.while_loop(
        cond, body, (tokens0, ended0, jnp.int32(1), caches)
    )

    is_end = tokens == END_ID
    first_end = jnp.where(jnp.any(is_end, axis=1), jnp.argmax(is_end, axis=1), S)
    pos = jnp.arange(S)[None, :]
    keep = pos <= first_end[:, None]
    out = jnp.where(keep, tokens, PAD_ID)
    return out, tokens


def matrix_to_phone_strings(matrix: np.ndarray) -> List[str]:
    """Rows of the accuracy matrix -> space-joined phone name strings."""
    out = []
    for row in np.asarray(matrix):
        names = [PHONEME_INVENTORY[int(t)] for t in row if int(t) != PAD_ID]
        out.append(" ".join(names))
    return out


def run_greedy(model, variables, batch: PackedBatch, max_frames: int,
               target_len: int, static_cap: Optional[int] = None,
               use_cache: bool = True) -> Tuple[List[str], np.ndarray]:
    """Host wrapper mirroring the reference signature: returns
    (phone strings, accuracy matrix cut to target_len+1 columns).
    ``target_len`` is tgt.shape[1] (the padded target length minus <S>)."""
    cap = static_cap if static_cap is not None else target_len
    if use_cache:
        out, _ = greedy_decode_cached(model, variables, batch, max_frames,
                                      cap, num_steps=target_len)
    else:
        out, _ = greedy_decode(model, variables, batch, max_frames, cap,
                               num_steps=target_len)
    out = np.asarray(out)[:, : target_len + 1]
    return matrix_to_phone_strings(out), out
