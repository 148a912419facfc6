"""Sinusoidal positional encoding, scaled by 1/d_model.

Matches the reference PositionalEncoding (transformer.py:406-435): the table
is standard interleaved sin/cos, added to the input scaled by 1/d_model,
followed by dropout.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionalEncoding(nn.Module):
    """``index_axis="position"`` is the standard per-position encoding.

    ``index_axis="batch"`` replicates the reference verbatim: its
    forward paths call pos_decoder on the *batch-first* tensor
    (architecture.py:126-127, :177-178) while PositionalEncoding indexes
    ``pe[:x.size(0)]`` assuming seq-first (transformer.py:432-434), so every
    position of batch row b receives the constant ``pe[b]`` — i.e. the
    trained reference decoder sees no per-position signal. Converted
    reference checkpoints need this mode for bit-parity.
    """

    d_model: int
    dropout: float = 0.2
    max_len: int = 5000
    index_axis: str = "position"  # "position" | "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        # x: (B, T, D)
        B, T = x.shape[0], x.shape[1]
        table = jnp.asarray(sinusoid_table(self.max_len, self.d_model))
        if self.index_axis == "batch":
            assert B < self.max_len
            pe = table[:B][:, None, :]  # (B, 1, D): constant per batch row
        else:
            assert T < self.max_len, "sequence too long for positional encoding"
            pe = table[None, :T, :]  # (1, T, D)
        x = x + (1.0 / self.d_model) * pe.astype(x.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)
