"""Post-norm transformer encoder/decoder layers (ReLU feed-forward).

Layer topology matches the reference TransformerEncoderLayer /
TransformerDecoderLayer (transformer.py:11-134): residual -> dropout ->
LayerNorm after each sublayer, relative-positional self-attention in the
encoder only, sinusoidally-encoded decoder with causal + padding masks.

Decoder layers additionally expose two TPU-serving paths that the reference
(which re-runs the full prefix every autoregressive step) lacks:
- ``__call__(..., cross_kv=...)``: full-prefix decode with the memory K/V
  projected once per utterance and shared across all beam hypotheses.
- ``decode_step``: single-token incremental decode over cached self K/V.
Both produce bit-identical logits to the full path (tested).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from emg_tpu.models.attention import NEG_FILL, MultiHeadAttention


class FeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        # dtype=x.dtype keeps the FFN matmuls at the compute dtype (flax
        # Dense otherwise promotes bf16 inputs to the float32 param dtype,
        # quietly running the hottest matmuls at the slow MXU rate)
        h = nn.Dense(self.d_ff, name="linear1", dtype=x.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2", dtype=x.dtype)(h)
        return h


class TransformerEncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float
    relative_positional_distance: int
    use_flash: bool = False

    @nn.compact
    def __call__(self, src, src_padding_mask, deterministic: bool):
        # LayerNorm math stays float32 (f32 params; bf16 mean-of-squares is
        # catastrophically lossy) but the stream returns to the compute
        # dtype afterwards — without the cast the first post-norm upcast
        # silently turns the whole stack float32
        cdt = src.dtype
        attn = MultiHeadAttention(
            self.d_model,
            self.num_heads,
            dropout=self.dropout,
            relative_positional=True,
            relative_positional_distance=self.relative_positional_distance,
            use_flash=self.use_flash,
            name="self_attn",
        )(
            src, src, src,
            key_padding_mask=src_padding_mask,
            query_padding_mask=src_padding_mask,
            deterministic=deterministic,
        )
        src = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src).astype(cdt)
        ff = FeedForward(self.d_model, self.d_ff, self.dropout, name="ff")(
            src, deterministic
        )
        src = src + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, name="norm2")(src).astype(cdt)
        return src


class TransformerDecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.d_model, self.num_heads, dropout=self.dropout, name="self_attn"
        )
        self.multihead_attn = MultiHeadAttention(
            self.d_model, self.num_heads, dropout=self.dropout, name="multihead_attn"
        )
        self.ff = FeedForward(self.d_model, self.d_ff, self.dropout, name="ff")
        self.norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        self.norm3 = nn.LayerNorm(epsilon=1e-5, name="norm3")
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        tgt,
        memory,
        tgt_padding_mask: Optional[jnp.ndarray],
        memory_padding_mask: Optional[jnp.ndarray],
        deterministic: bool,
        cross_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        cdt = tgt.dtype
        sa = self.self_attn(
            tgt, tgt, tgt,
            key_padding_mask=tgt_padding_mask,
            query_padding_mask=tgt_padding_mask,
            causal=True,
            deterministic=deterministic,
        )
        tgt = tgt + self.drop(sa, deterministic=deterministic)
        tgt = self.norm1(tgt).astype(cdt)

        if cross_kv is None:
            ca = self.multihead_attn(
                tgt, memory, memory,
                key_padding_mask=memory_padding_mask,
                deterministic=deterministic,
            )
        else:
            ca = self._cross_shared(tgt, cross_kv, memory_padding_mask)
        tgt = tgt + self.drop(ca, deterministic=deterministic)
        tgt = self.norm2(tgt).astype(cdt)

        ffo = self.ff(tgt, deterministic)
        tgt = tgt + self.drop(ffo, deterministic=deterministic)
        tgt = self.norm3(tgt).astype(cdt)
        return tgt

    def _cross_shared(self, tgt, cross_kv, memory_padding_mask):
        """Cross-attention with memory K/V projected once (batch 1) and
        shared across every row of ``tgt`` — the beam-search fast path."""
        k1, v1 = cross_kv  # (1, H, T, Dh)
        q = self.multihead_attn.project_q(tgt)  # (B, H, S, Dh)
        logits = jnp.einsum("bhqa,hka->bhqk", q, k1[0]) / (
            self.multihead_attn.head_dim ** 0.5
        )
        if memory_padding_mask is not None:
            logits = jnp.where(
                memory_padding_mask[:1][:, None, None, :], NEG_FILL, logits
            )
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,hka->bhqa", probs, v1[0])
        return self.multihead_attn.output(o)

    def project_cross_kv(self, memory):
        """Project memory into this layer's cross-attention K/V once."""
        return self.multihead_attn.project_kv(memory)

    def decode_step(
        self,
        x_tok: jnp.ndarray,  # (B, 1, D)
        layer_idx: int,  # static index of this layer in the stacked caches
        k_all: jnp.ndarray,  # (L, B, H, S, Dh) stacked self-K cache
        v_all: jnp.ndarray,  # (L, B, H, S, Dh) stacked self-V cache
        cross_k: jnp.ndarray,  # (B or 1, H, T, Dh)
        cross_v: jnp.ndarray,
        step,  # () current position
        tokens_pad_mask: jnp.ndarray,  # (B, S) generated-PAD keys
        query_is_pad: jnp.ndarray,  # (B,)
        memory_padding_mask: jnp.ndarray,  # (B or 1, T)
    ):
        B, _, D = x_tok.shape
        S = k_all.shape[3]
        # one fused matmul projects the token's q, k, v together. The new
        # K/V row is NOT written here: attention reads the stale cache and
        # splices the current token's contribution in-register (attend_step
        # cur_kv), and the TransformerDecoder writes all layers' rows with
        # one stacked dynamic_update_slice after the layer loop — every
        # cache read precedes the single write, so XLA updates the carried
        # buffers in place instead of copying them per layer.
        q_new, k_new, v_new = self.self_attn.project_qkv(x_tok)  # (B, H, 1, Dh)
        valid = jnp.arange(S)[None, :] <= step  # causal over generated keys
        cdt = x_tok.dtype
        sa = self.self_attn.attend_step(
            x_tok, k_all[layer_idx], v_all[layer_idx], valid, tokens_pad_mask,
            query_is_pad, q=q_new, cur_kv=(k_new, v_new), step=step,
        )
        x = self.norm1(x_tok + sa).astype(cdt)

        # cross-attention (no query masking, matching the reference);
        # logits accumulate float32 so the softmax stays exact at bf16
        q = self.multihead_attn.project_q(x)
        if cross_k.shape[0] == 1 and B > 1:
            logits = jnp.einsum("bhqa,hka->bhqk", q, cross_k[0],
                                preferred_element_type=jnp.float32)
        else:
            logits = jnp.einsum("bhqa,bhka->bhqk", q, cross_k,
                                preferred_element_type=jnp.float32)
        logits = logits / (self.multihead_attn.head_dim ** 0.5)
        mpm = memory_padding_mask
        logits = jnp.where(mpm[:, None, None, :], NEG_FILL, logits)
        probs = jax.nn.softmax(logits, axis=-1).astype(cross_v.dtype)
        if cross_v.shape[0] == 1 and B > 1:
            o = jnp.einsum("bhqk,hka->bhqa", probs, cross_v[0])
        else:
            o = jnp.einsum("bhqk,bhka->bhqa", probs, cross_v)
        ca = self.multihead_attn.output(o)
        x = self.norm2(x + ca).astype(cdt)

        x = self.norm3(x + self.ff(x, True)).astype(cdt)
        return x, k_new, v_new


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float
    relative_positional_distance: int
    use_flash: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, src, src_padding_mask, deterministic: bool):
        layer_cls = TransformerEncoderLayer
        if self.remat:
            # rematerialize each layer on the backward pass: trades FLOPs
            # for activation memory (jax.checkpoint under the hood).
            # static_argnums counts self as 0, so deterministic is 3 — it
            # must stay a Python bool for the flash gate's per-regime
            # threshold branch (models/attention.py)
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(3,))
        for i in range(self.num_layers):
            src = layer_cls(
                self.d_model,
                self.num_heads,
                self.d_ff,
                self.dropout,
                self.relative_positional_distance,
                self.use_flash,
                name=f"layer{i}",
            )(src, src_padding_mask, deterministic)
        return src


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float

    def setup(self):
        self.layers = [
            TransformerDecoderLayer(
                self.d_model, self.num_heads, self.d_ff, self.dropout, name=f"layer{i}"
            )
            for i in range(self.num_layers)
        ]

    def __call__(self, tgt, memory, tgt_padding_mask, memory_padding_mask,
                 deterministic: bool, cross_kvs=None):
        for i, layer in enumerate(self.layers):
            ckv = cross_kvs[i] if cross_kvs is not None else None
            tgt = layer(tgt, memory, tgt_padding_mask, memory_padding_mask,
                        deterministic, cross_kv=ckv)
        return tgt

    def project_cross_kvs(self, memory):
        return [layer.project_cross_kv(memory) for layer in self.layers]

    def decode_step(self, x_tok, caches, cross_kvs, step, tokens_pad_mask,
                    query_is_pad, memory_padding_mask):
        """caches: (k_all, v_all), each (L, B, H, S, Dh) stacked over layers
        (beam reordering then costs 2 gathers, not 2*L). Returns
        (out, caches). Layers only READ the caches; the new K/V rows of all
        layers land in two stacked writes here, after the last read."""
        k_all, v_all = caches
        k_news, v_news = [], []
        for i, layer in enumerate(self.layers):
            ck, cv = cross_kvs[i]
            x_tok, k_new, v_new = layer.decode_step(
                x_tok, i, k_all, v_all, ck, cv, step, tokens_pad_mask,
                query_is_pad, memory_padding_mask,
            )
            k_news.append(k_new)
            v_news.append(v_new)
        k_all = jax.lax.dynamic_update_slice(
            k_all, jnp.stack(k_news).astype(k_all.dtype), (0, 0, 0, step, 0)
        )
        v_all = jax.lax.dynamic_update_slice(
            v_all, jnp.stack(v_news).astype(v_all.dtype), (0, 0, 0, step, 0)
        )
        return x_tok, (k_all, v_all)
