"""Post-norm transformer encoder/decoder layers (ReLU feed-forward).

Layer topology matches the reference TransformerEncoderLayer /
TransformerDecoderLayer (transformer.py:11-134): residual -> dropout ->
LayerNorm after each sublayer, relative-positional self-attention in the
encoder only, sinusoidally-encoded decoder with causal + padding masks.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from emg_tpu.models.attention import MultiHeadAttention


class FeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        h = nn.Dense(self.d_ff, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2")(h)
        return h


class TransformerEncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float
    relative_positional_distance: int

    @nn.compact
    def __call__(self, src, src_padding_mask, deterministic: bool):
        attn = MultiHeadAttention(
            self.d_model,
            self.num_heads,
            dropout=self.dropout,
            relative_positional=True,
            relative_positional_distance=self.relative_positional_distance,
            name="self_attn",
        )(
            src, src, src,
            key_padding_mask=src_padding_mask,
            query_padding_mask=src_padding_mask,
            deterministic=deterministic,
        )
        src = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(name="norm1")(src)
        ff = FeedForward(self.d_model, self.d_ff, self.dropout, name="ff")(
            src, deterministic
        )
        src = src + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        src = nn.LayerNorm(name="norm2")(src)
        return src


class TransformerDecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        tgt_padding_mask: Optional[jnp.ndarray],
        memory_padding_mask: Optional[jnp.ndarray],
        deterministic: bool,
    ):
        sa = MultiHeadAttention(
            self.d_model, self.num_heads, dropout=self.dropout, name="self_attn"
        )(
            tgt, tgt, tgt,
            key_padding_mask=tgt_padding_mask,
            query_padding_mask=tgt_padding_mask,
            causal=True,
            deterministic=deterministic,
        )
        tgt = tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm1")(tgt)

        ca = MultiHeadAttention(
            self.d_model, self.num_heads, dropout=self.dropout, name="multihead_attn"
        )(
            tgt, memory, memory,
            key_padding_mask=memory_padding_mask,
            deterministic=deterministic,
        )
        tgt = tgt + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm2")(tgt)

        ff = FeedForward(self.d_model, self.d_ff, self.dropout, name="ff")(
            tgt, deterministic
        )
        tgt = tgt + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        tgt = nn.LayerNorm(name="norm3")(tgt)
        return tgt


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float
    relative_positional_distance: int

    @nn.compact
    def __call__(self, src, src_padding_mask, deterministic: bool):
        for i in range(self.num_layers):
            src = TransformerEncoderLayer(
                self.d_model,
                self.num_heads,
                self.d_ff,
                self.dropout,
                self.relative_positional_distance,
                name=f"layer{i}",
            )(src, src_padding_mask, deterministic)
        return src


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float

    @nn.compact
    def __call__(self, tgt, memory, tgt_padding_mask, memory_padding_mask, deterministic: bool):
        for i in range(self.num_layers):
            tgt = TransformerDecoderLayer(
                self.d_model, self.num_heads, self.d_ff, self.dropout, name=f"layer{i}"
            )(tgt, memory, tgt_padding_mask, memory_padding_mask, deterministic)
        return tgt
