"""Einsum multi-head attention with learned relative positional logits.

Functional re-design of the reference's MultiHeadAttention +
LearnedRelativePositionalEmbedding (transformer.py:137-403): per-head
projection tensors, additive -1e8 masking, and — for encoder self-attention
— a per-head table of 2*maxpos-1 learned relative-position embeddings whose
query products are mapped from relative to absolute indexing with the
standard pad-reshape skew (the fairseq/Transformer-XL trick), expressed
here as batched XLA reshapes. All shapes are batch-first (B, T, D).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_FILL = -1e8


def relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, L, 2L-1) relative logits -> (B, H, L, L) absolute logits.

    out[b,h,q,k] = x[b,h,q, k-q+L-1]; implemented by the pad/reshape skew.
    """
    B, H, L, W = x.shape
    assert W == 2 * L - 1
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))  # (B,H,L,2L)
    x = x.reshape(B, H, L * 2 * L)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, L - 1)))
    x = x.reshape(B, H, L + 1, 2 * L - 1)
    return x[:, :, :L, L - 1 :]


class LearnedRelativePositionalBias(nn.Module):
    """Unmasked (encoder) relative positional logits added to attention."""

    max_relative_pos: int
    num_heads: int
    head_dim: int

    @nn.compact
    def __call__(self, q: jnp.ndarray) -> jnp.ndarray:
        """q: (B, H, L, Dh) projected queries -> (B, H, L, L) logits."""
        B, H, L, Dh = q.shape
        n_emb = 2 * self.max_relative_pos - 1
        table = self.param(
            "embeddings",
            nn.initializers.normal(stddev=self.head_dim ** -0.5),
            (self.num_heads, n_emb, self.head_dim),
        )
        # the table covers relative positions [-(maxpos-1), maxpos-1]; a
        # query of length L needs [-(L-1), L-1] — zero-pad or slice to fit
        pad = max(L - self.max_relative_pos, 0)
        start = max(self.max_relative_pos - L, 0)
        padded = jnp.pad(table, ((0, 0), (pad, pad), (0, 0)))
        used = jax.lax.dynamic_slice_in_dim(padded, start, 2 * L - 1, axis=1)

        rel_logits = jnp.einsum("bhld,hmd->bhlm", q, used.astype(q.dtype))
        if L > self.max_relative_pos:
            # out-of-range relative positions are pushed to -inf
            m = jnp.arange(2 * L - 1)
            oob = (m < pad) | (m >= 2 * L - 1 - pad)
            rel_logits = rel_logits + jnp.where(oob, NEG_FILL, 0.0)[None, None, None, :]
        return relative_to_absolute(rel_logits)


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dropout: float = 0.1
    relative_positional: bool = False
    relative_positional_distance: int = 100

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Tq, D)
        key: jnp.ndarray,  # (B, Tk, D)
        value: jnp.ndarray,  # (B, Tk, D)
        *,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, Tk) True=pad
        query_padding_mask: Optional[jnp.ndarray] = None,  # (B, Tq) True=pad
        causal: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        H = self.num_heads
        Dh = self.d_model // H
        assert Dh * H == self.d_model

        def proj_param(name):
            return self.param(
                name,
                _xavier_normal_headed(),
                (H, self.d_model, Dh),
            )

        w_q = proj_param("w_q")
        w_k = proj_param("w_k")
        w_v = proj_param("w_v")
        w_o = self.param("w_o", _xavier_normal_headed_out(), (H, Dh, self.d_model))

        q = jnp.einsum("btf,hfa->bhta", query, w_q.astype(query.dtype))
        k = jnp.einsum("btf,hfa->bhta", key, w_k.astype(key.dtype))
        v = jnp.einsum("btf,hfa->bhta", value, w_v.astype(value.dtype))

        logits = jnp.einsum("bhqa,bhka->bhqk", q, k) / (Dh ** 0.5)

        if causal:
            Tq, Tk = logits.shape[2], logits.shape[3]
            cmask = jnp.tril(jnp.ones((Tq, Tk), bool))
            logits = jnp.where(cmask[None, None], logits, NEG_FILL)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], NEG_FILL, logits)
        if query_padding_mask is not None:
            logits = jnp.where(query_padding_mask[:, None, :, None], NEG_FILL, logits)

        if self.relative_positional:
            logits = logits + LearnedRelativePositionalBias(
                self.relative_positional_distance, H, Dh, name="relative_positional"
            )(q)

        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        o = jnp.einsum("bhqk,bhka->bhqa", probs, v)
        return jnp.einsum("bhta,haf->btf", o, w_o.astype(o.dtype))


def _xavier_normal_headed():
    """torch.nn.init.xavier_normal_ semantics for an (H, Din, Dout) tensor:
    fan_in = shape[1] * receptive_field, fan_out = shape[0] *
    receptive_field, with receptive_field = prod(shape[2:])."""

    def init(key, shape, dtype=jnp.float32):
        receptive = 1
        for s in shape[2:]:
            receptive *= s
        fan_in = shape[1] * receptive
        fan_out = shape[0] * receptive
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.normal(key, shape, dtype) * std

    return init


_xavier_normal_headed_out = _xavier_normal_headed
