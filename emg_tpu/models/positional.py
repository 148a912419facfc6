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
    d_model: int
    dropout: float = 0.2
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        # x: (B, T, D)
        T = x.shape[1]
        assert T < self.max_len, "sequence too long for positional encoding"
        pe = jnp.asarray(sinusoid_table(self.max_len, self.d_model)[:T])
        x = x + (1.0 / self.d_model) * pe[None, :, :].astype(x.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)
