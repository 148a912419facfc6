"""The EMG-to-phoneme model: ResBlock CNN subsampler + transformer
encoder-decoder with dual CTC/CE heads.

Capability-parity with the reference Model (architecture.py:50-188):
raw-EMG packed rows -> stride-8 CNN -> linear -> per-utterance re-batching
(a static-shape gather replaces the reference's decollate_tensor +
pad_sequence) -> relative-positional transformer encoder -> CTC head; target
embedding (+1/d-scaled sinusoidal PE) -> causal transformer decoder with
cross-attention -> CE head. Train-time random time-shift augmentation
(r in [0,8)) is applied to the packed rows, as in the reference.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from emg_tpu.config import ModelConfig
from emg_tpu.models.positional import PositionalEncoding
from emg_tpu.models.resnet import ConvStack
from emg_tpu.models.transformer import TransformerDecoder, TransformerEncoder
from emg_tpu.text.phonemes import N_PHONES, PAD_ID

NUM_OUTS_DEC = N_PHONES  # 43
NUM_OUTS_ENC = N_PHONES + 1  # 44, extra class is the CTC blank


def _shift_rows(x: jnp.ndarray, r) -> jnp.ndarray:
    """Shift each packed row left by r samples, zero-filling the tail
    (reference architecture.py:104-107)."""
    N, L, C = x.shape
    idx = jnp.arange(L) + r
    shifted = jnp.take(x, jnp.clip(idx, 0, L - 1), axis=1)
    return jnp.where((idx < L)[None, :, None], shifted, 0.0)


def _gather_utterances(flat: jnp.ndarray, offsets: jnp.ndarray, lengths: jnp.ndarray, T: int):
    """(total_frames, D) -> (B, T, D) per-utterance gather + padding mask.

    Utterance b occupies rows [offsets[b], offsets[b]+lengths[b]) of the
    concatenated post-CNN frame stream. Returns (batched, padding_mask)
    where padding_mask is True at padded positions.
    """
    B = offsets.shape[0]
    pos = jnp.arange(T)[None, :]  # (1, T)
    idx = offsets[:, None] + pos  # (B, T)
    valid = pos < lengths[:, None]
    idx = jnp.clip(idx, 0, flat.shape[0] - 1)
    out = jnp.take(flat, idx, axis=0)  # (B, T, D)
    out = jnp.where(valid[:, :, None], out, 0.0)
    return out, ~valid


class EMGModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        if c.encoder_kind == "conformer":
            from emg_tpu.models.conformer import ConformerEncoder

            encoder = ConformerEncoder(
                num_layers=c.num_layers_encoder,
                d_model=c.model_size,
                num_heads=c.n_heads_encoder,
                d_ff=c.feed_forward_layer_size,
                dropout=c.dropout_model,
                relative_positional_distance=c.relative_distance,
                conv_kernel_size=c.conformer_conv_kernel_size,
            )
        else:
            encoder = TransformerEncoder(
                num_layers=c.num_layers_encoder,
                d_model=c.model_size,
                num_heads=c.n_heads_encoder,
                d_ff=c.feed_forward_layer_size,
                dropout=c.dropout_model,
                relative_positional_distance=c.relative_distance,
                use_flash=c.use_flash_attention,
                remat=c.remat,
            )
        cdt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        self.conv_blocks = ConvStack(c.model_size, dtype=cdt)
        self.w_raw_in = nn.Dense(c.model_size, dtype=cdt)
        self.embedding_tgt = nn.Embed(
            NUM_OUTS_DEC, c.model_size, embedding_init=nn.initializers.normal(1.0)
        )
        self.pos_decoder = PositionalEncoding(
            c.model_size, c.dropout_pos_emb,
            index_axis="batch" if c.decoder_pe == "reference_batch" else "position",
        )
        self.transformerEncoder = encoder
        self.transformerDecoder = TransformerDecoder(
            num_layers=c.num_layers_decoder,
            d_model=c.model_size,
            num_heads=c.n_heads_decoder,
            d_ff=c.feed_forward_layer_size,
            dropout=c.dropout_model,
        )
        self.w_aux = nn.Dense(NUM_OUTS_ENC)
        self.w_out = nn.Dense(NUM_OUTS_DEC)

    # -- encoder path ------------------------------------------------------
    def encode(
        self,
        packed_raw: jnp.ndarray,  # (N, chunk, C)
        n_rows,  # valid packed rows
        offsets: jnp.ndarray,  # (B,)
        lengths: jnp.ndarray,  # (B,)
        max_frames: int,  # static T for the re-batched encoder input
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (memory (B,T,D), enc_logits (B,T,44), src_pad_mask (B,T))."""
        x = packed_raw
        if train:
            r = jax.random.randint(self.make_rng("shift"), (), 0, 8)
            x = jax.lax.cond(r > 0, lambda v: _shift_rows(v, r), lambda v: v, x)

        compute_dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        x = self.conv_blocks(x, n_rows, use_running_average=not train)
        x = self.w_raw_in(x)  # (N, chunk/8, D)

        flat = x.reshape(-1, x.shape[-1])
        src, src_pad_mask = _gather_utterances(flat, offsets, lengths, max_frames)
        src = src.astype(compute_dtype)
        if self.cfg.sequence_shard:
            # sequence parallelism: split the time dim over the mesh
            # "model" axis through the encoder stack (XLA SPMD propagates
            # the sharding layer to layer and inserts the attention
            # all-gathers over ICI), then return to batch-only sharding
            # for the decoder's cross-attention
            from jax.sharding import PartitionSpec as P

            src = jax.lax.with_sharding_constraint(src, P("data", "model", None))
        memory = self.transformerEncoder(src, src_pad_mask, deterministic=not train)
        if self.cfg.sequence_shard:
            from jax.sharding import PartitionSpec as P

            memory = jax.lax.with_sharding_constraint(memory, P("data", None, None))
        memory = memory.astype(jnp.float32)
        return memory, self.w_aux(memory), src_pad_mask

    # -- decoder path ------------------------------------------------------
    def _embed_targets(self, y: jnp.ndarray) -> jnp.ndarray:
        table = jnp.asarray(self.embedding_tgt.embedding)
        # torch padding_idx semantics: the PAD row is pinned to zero (it
        # still reaches the loss through the exp-logit regularizer, so it
        # must stay exactly zero rather than drift)
        table = table.at[PAD_ID].set(0.0)
        return table[y]

    def decode(
        self,
        y: jnp.ndarray,  # (B, S) int target ids (teacher-forced inputs)
        memory: jnp.ndarray,  # (B, T, D)
        memory_pad_mask: jnp.ndarray,  # (B, T)
        train: bool = False,
        cross_kvs=None,  # optional per-layer memory K/V (beam fast path)
    ) -> jnp.ndarray:
        """Returns dec_logits (B, S, 43)."""
        tgt = self._embed_targets(y)
        tgt = self.pos_decoder(tgt, deterministic=not train)
        tgt_pad_mask = y == PAD_ID
        compute_dtype = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        out = self.transformerDecoder(
            tgt.astype(compute_dtype),
            memory.astype(compute_dtype) if memory is not None else None,
            tgt_pad_mask,
            memory_pad_mask,
            deterministic=not train,
            cross_kvs=cross_kvs,
        )
        return self.w_out(out.astype(jnp.float32))

    def _compute_dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

    def project_cross_kvs(self, memory: jnp.ndarray):
        """Per-decoder-layer memory K/V, computed once per utterance, at the
        compute dtype (they are cache-resident through the whole decode)."""
        memory = memory.astype(self._compute_dtype())
        return self.transformerDecoder.project_cross_kvs(memory)

    def init_decode_cache(self, batch_size: int, max_len: int):
        """Zeroed self-attention K/V caches for incremental decoding:
        (k_all, v_all) stacked over layers, at the compute dtype."""
        L = self.cfg.num_layers_decoder
        H = self.cfg.n_heads_decoder
        Dh = self.cfg.model_size // H
        dt = self._compute_dtype()
        return (
            jnp.zeros((L, batch_size, H, max_len, Dh), dt),
            jnp.zeros((L, batch_size, H, max_len, Dh), dt),
        )

    def decode_step(
        self,
        token_ids: jnp.ndarray,  # (B,) current input token
        step,  # () its position
        caches,  # per-layer (self_k, self_v)
        cross_kvs,  # per-layer (cross_k, cross_v)
        tokens: jnp.ndarray,  # (B, S) all tokens so far (for PAD masking)
        memory_pad_mask: jnp.ndarray,  # (B or 1, T)
    ):
        """One incremental decode step; returns (logits (B, 43), caches)."""
        from emg_tpu.models.positional import sinusoid_table

        x = self._embed_targets(token_ids)[:, None, :]  # (B, 1, D)
        pe = jnp.asarray(sinusoid_table(5000, self.cfg.model_size))
        if self.cfg.decoder_pe == "reference_batch":
            # constant pe[row] per batch row (see PositionalEncoding)
            x = x + (1.0 / self.cfg.model_size) * pe[: x.shape[0]][:, None, :]
        else:
            x = x + (1.0 / self.cfg.model_size) * jax.lax.dynamic_index_in_dim(
                pe, step, axis=0, keepdims=True
            )[None]
        tokens_pad_mask = tokens == PAD_ID
        query_is_pad = token_ids == PAD_ID
        x = x.astype(self._compute_dtype())
        out, caches = self.transformerDecoder.decode_step(
            x, caches, cross_kvs, step, tokens_pad_mask, query_is_pad,
            memory_pad_mask,
        )
        return self.w_out(out[:, 0].astype(jnp.float32)), caches

    def __call__(
        self,
        packed_raw: jnp.ndarray,
        n_rows,
        offsets: jnp.ndarray,
        lengths: jnp.ndarray,
        y: jnp.ndarray,
        max_frames: int,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Training/eval forward: returns (enc_logits, dec_logits)."""
        memory, enc_logits, src_pad_mask = self.encode(
            packed_raw, n_rows, offsets, lengths, max_frames, train=train
        )
        dec_logits = self.decode(y, memory, src_pad_mask, train=train)
        return enc_logits, dec_logits
