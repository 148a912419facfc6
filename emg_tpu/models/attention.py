"""Einsum multi-head attention with learned relative positional logits.

Functional re-design of the reference's MultiHeadAttention +
LearnedRelativePositionalEmbedding (transformer.py:137-403): per-head
projection tensors, additive -1e8 masking, and — for encoder self-attention
— a per-head table of 2*maxpos-1 learned relative-position embeddings whose
query products are mapped from relative to absolute indexing with the
standard pad-reshape skew (the fairseq/Transformer-XL trick), expressed
here as batched XLA reshapes. All shapes are batch-first (B, T, D).

The module is setup-style so the incremental-decoding path (project one
query token, attend over cached K/V) shares parameters with the full path.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_FILL = -1e8  # reference masked_fill value
# smallest NATIVE length routed to the flash kernel, measured per regime on
# v5e (benchmarks/flash_gate_check.py, 2026-08-18): serving fwd — flash wins
# from T=256 (2.24 vs 2.69 ms; ties approaching it) and 2.7-3.2x by T>=384;
# training fwd+bwd — XLA wins through 256 (3.79 vs 3.87 ms) and flash from
# 384 (6.81 vs 11.08 ms). The ragged 192 bucket (padded to 256) LOSES on
# both (serve 2.03 vs 1.90, train 3.80 vs 2.63), so the gate thresholds the
# native T, keeping 192 on XLA while still padding hypothetical ragged
# buckets above the threshold. EMG_TPU_FLASH_MIN_T overrides BOTH for gate
# measurements.
_min_t_env = os.environ.get("EMG_TPU_FLASH_MIN_T")
FLASH_MIN_T_SERVE = int(_min_t_env) if _min_t_env else 256
FLASH_MIN_T_TRAIN = int(_min_t_env) if _min_t_env else 384
STRUCT_MASK = -jnp.inf  # structural (not-yet-generated) positions


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

    def setup(self):
        self.table = self.param(
            "embeddings",
            nn.initializers.normal(stddev=self.head_dim ** -0.5),
            (self.num_heads, 2 * self.max_relative_pos - 1, self.head_dim),
        )

    def window(self, L: int):
        """The length-L embedding window: (H, 2L-1, Dh) table slice plus a
        (2L-1,) additive out-of-range mask (0 / NEG_FILL).

        The table covers relative positions [-(maxpos-1), maxpos-1]; a
        query of length L needs [-(L-1), L-1] — zero-pad or slice to fit.
        Shared by the XLA skew path and the Pallas flash kernel.
        """
        pad = max(L - self.max_relative_pos, 0)
        start = max(self.max_relative_pos - L, 0)
        padded = jnp.pad(jnp.asarray(self.table), ((0, 0), (pad, pad), (0, 0)))
        used = jax.lax.dynamic_slice_in_dim(padded, start, 2 * L - 1, axis=1)
        m = jnp.arange(2 * L - 1)
        # out-of-range relative positions are pushed to -1e8
        oob = jnp.where((m < pad) | (m >= 2 * L - 1 - pad), NEG_FILL, 0.0)
        return used, oob

    def __call__(self, q: jnp.ndarray) -> jnp.ndarray:
        """q: (B, H, L, Dh) projected queries -> (B, H, L, L) logits."""
        B, H, L, Dh = q.shape
        used, oob = self.window(L)
        rel_logits = jnp.einsum("bhld,hmd->bhlm", q, used.astype(q.dtype))
        if L > self.max_relative_pos:
            rel_logits = rel_logits + oob.astype(q.dtype)[None, None, None, :]
        return relative_to_absolute(rel_logits)


class MultiHeadAttention(nn.Module):
    d_model: int
    num_heads: int
    dropout: float = 0.1
    relative_positional: bool = False
    relative_positional_distance: int = 100
    use_flash: bool = False

    def setup(self):
        H = self.num_heads
        Dh = self.d_model // H
        assert Dh * H == self.d_model
        self.head_dim = Dh
        init = _xavier_normal_headed()
        self.w_q = self.param("w_q", init, (H, self.d_model, Dh))
        self.w_k = self.param("w_k", init, (H, self.d_model, Dh))
        self.w_v = self.param("w_v", init, (H, self.d_model, Dh))
        self.w_o = self.param("w_o", init, (H, Dh, self.d_model))
        if self.relative_positional:
            self.relpos = LearnedRelativePositionalBias(
                self.relative_positional_distance, H, Dh, name="relative_positional"
            )
        self.drop = nn.Dropout(self.dropout)

    # -- projections (shared by both paths) --------------------------------
    # k/v (and q/k/v for self-attention) always project the SAME input, so
    # they fuse into one matmul over concatenated weight tensors: fewer,
    # fatter MXU ops — which is what the op-dispatch-bound incremental
    # decode loops (greedy/beam, ~hundreds of small ops per step) need. The
    # parameters stay separate (w_q/w_k/w_v), matching the reference
    # checkpoint layout; the concatenation is loop-invariant and hoisted.
    def project_q(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("btf,hfa->bhta", x, jnp.asarray(self.w_q).astype(x.dtype))

    def project_kv(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = jnp.concatenate(
            [jnp.asarray(self.w_k), jnp.asarray(self.w_v)], axis=0
        ).astype(x.dtype)  # (2H, D, Dh)
        kv = jnp.einsum("btf,hfa->bhta", x, w)
        return kv[:, : self.num_heads], kv[:, self.num_heads :]

    def project_qkv(
        self, x: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        w = jnp.concatenate(
            [jnp.asarray(self.w_q), jnp.asarray(self.w_k), jnp.asarray(self.w_v)],
            axis=0,
        ).astype(x.dtype)  # (3H, D, Dh)
        qkv = jnp.einsum("btf,hfa->bhta", x, w)
        H = self.num_heads
        return qkv[:, :H], qkv[:, H : 2 * H], qkv[:, 2 * H :]

    def output(self, o: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("bhta,haf->btf", o, jnp.asarray(self.w_o).astype(o.dtype))

    # -- full path ---------------------------------------------------------
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
        if key is query:  # self-attention: one fused projection matmul
            q, k, v = self.project_qkv(query)
        else:
            q = self.project_q(query)
            k, v = self.project_kv(key)
        if value is not key:  # not used by this architecture, kept for API
            _, v = self.project_kv(value)

        # ragged buckets pad up to the kernel's 128 tile (192 -> 256): the
        # pad keys are masked out and the pad query rows sliced off, so the
        # result is exact; the pad FLOPs trade against the XLA path's
        # materialized rel->abs skew reshapes (~3.6 ms each at T=384, B=39
        # — profiled r3)
        T_ = q.shape[2]
        Tp = ((T_ + 127) // 128) * 128
        min_t = FLASH_MIN_T_SERVE if deterministic else FLASH_MIN_T_TRAIN
        if (
            self.use_flash
            and self.relative_positional
            and not causal
            and T_ >= min_t  # per-regime thresholds measured on v5e —
            #  see the FLASH_MIN_T_* comment at the top of this file
        ):
            from emg_tpu.ops.pallas.flash_attention import (
                flash_attention_relpos,
                flash_attention_relpos_train,
                flash_available,
            )

            if flash_available():
                # query-pad fills are a softmax row no-op — only key pads
                # change the distribution, so only they enter the kernel
                used, oob = self.relpos.window(Tp)
                kp = (
                    key_padding_mask
                    if key_padding_mask is not None
                    else jnp.zeros(q.shape[:1] + (k.shape[2],), bool)
                )
                if Tp != T_:
                    pad = ((0, 0), (0, 0), (0, Tp - T_), (0, 0))
                    q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
                    kp = jnp.pad(kp, ((0, 0), (0, Tp - T_)),
                                 constant_values=True)
                # block size: 256 where T tiles by it (measured best at
                # 512+); otherwise one full-T block — at T=384 the single
                # (384,384) block runs the fwd+bwd pair 1.9x faster than
                # (128,128) tiling (8.1 vs 15.2 ms at B=39, v5e)
                blk = 256 if Tp % 256 == 0 else (Tp if Tp <= 512 else 128)
                if deterministic:
                    # kernel accumulates float32; return at the stream dtype
                    o = flash_attention_relpos(q, k, v, used, oob, kp,
                                               bq=blk, bk=blk)
                    o = o.astype(query.dtype)
                else:
                    # training twin: differentiable, with the reference's
                    # post-softmax dropout applied inside the kernel (the
                    # mask is a pure hash of (seed, b, h, query, key)).
                    # At rate 0 no rng is consumed — nn.Dropout likewise
                    # short-circuits, so callers without a dropout rng work
                    if self.dropout > 0.0:
                        seed = jax.random.bits(
                            self.make_rng("dropout"), (), jnp.uint32
                        ).astype(jnp.int32)
                    else:
                        seed = jnp.int32(0)
                    o = flash_attention_relpos_train(
                        q, k, v, used, oob, kp, self.dropout, seed,
                        bq=blk, bk=blk,
                    )
                if Tp != T_:
                    o = o[:, :, :T_]
                return self.output(o)

        logits = jnp.einsum("bhqa,bhka->bhqk", q, k) / (self.head_dim ** 0.5)

        if causal:
            Tq, Tk = logits.shape[2], logits.shape[3]
            cmask = jnp.tril(jnp.ones((Tq, Tk), bool))
            logits = jnp.where(cmask[None, None], logits, NEG_FILL)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], NEG_FILL, logits)
        if query_padding_mask is not None:
            logits = jnp.where(query_padding_mask[:, None, :, None], NEG_FILL, logits)

        if self.relative_positional:
            logits = logits + self.relpos(q)

        probs = jax.nn.softmax(logits, axis=-1)
        probs = self.drop(probs, deterministic=deterministic)
        o = jnp.einsum("bhqk,bhka->bhqa", probs, v)
        return self.output(o)

    # -- incremental path --------------------------------------------------
    def attend_step(
        self,
        q_tok: jnp.ndarray,  # (B, 1, D) current-token input
        k_cache: jnp.ndarray,  # (B, H, S, Dh)
        v_cache: jnp.ndarray,  # (B, H, S, Dh)
        valid_mask: jnp.ndarray,  # (B, S) True where the key exists & may be
        #                           attended (structural + pad combined by
        #                           the caller into one of three states via
        #                           logit values below)
        pad_mask: jnp.ndarray,  # (B, S) True where key is a PAD token
        query_is_pad: jnp.ndarray,  # (B,) current token is PAD
        q: Optional[jnp.ndarray] = None,  # pre-projected (B, H, 1, Dh), e.g.
        #                                    from a fused project_qkv call
        cur_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        step=None,  # () position of cur_kv when given
    ) -> jnp.ndarray:
        """One-token attention over cached keys/values. Masking reproduces
        the reference's full-prefix semantics exactly: keys not yet
        generated are structurally excluded (-inf -> probability 0), PAD
        keys and PAD queries are set to -1e8 (softmax ties, as in the
        reference's masked_fill).

        ``cur_kv=(k_new, v_new)``: the cache row at ``step`` is STALE and
        the current token's K/V arrive in-register instead — their logit
        and value contributions are spliced in here. This keeps every read
        of the cache before its single write in decode loops, which is what
        lets XLA update the (layer-stacked) cache carry in place.
        """
        if q is None:
            q = self.project_q(q_tok)  # (B, H, 1, Dh)
        # logits accumulate float32 so the softmax stays exact when the
        # caches are bfloat16; probs return to the cache dtype for the
        # value contraction (standard mixed-precision attention)
        logits = jnp.einsum(
            "bhqa,bhka->bhqk", q, k_cache.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) / (self.head_dim ** 0.5)
        if cur_kv is not None:
            k_new, v_new = cur_kv
            cur_logit = jnp.sum(
                q.astype(jnp.float32) * k_new.astype(jnp.float32), axis=-1
            ) / (self.head_dim ** 0.5)  # (B, H, 1)
            at_step = jnp.arange(k_cache.shape[2]) == step  # (S,)
            logits = jnp.where(
                at_step[None, None, None, :], cur_logit[..., None], logits
            )
        logits = jnp.where(pad_mask[:, None, None, :], NEG_FILL, logits)
        logits = jnp.where(query_is_pad[:, None, None, None], NEG_FILL, logits)
        logits = jnp.where(valid_mask[:, None, None, :], logits, STRUCT_MASK)
        probs = jnp.asarray(jax.nn.softmax(logits, axis=-1)).astype(v_cache.dtype)
        o = jnp.einsum("bhqk,bhka->bhqa", probs, v_cache)
        if cur_kv is not None:
            p_step = jnp.sum(
                probs * at_step[None, None, None, :].astype(probs.dtype),
                axis=-1, keepdims=True,
            )  # (B, H, 1, 1)
            o = o + p_step * v_new.astype(o.dtype)
        return self.output(o)


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
