"""Conformer encoder variant.

The reference's logs_to_save/ record a ``conformer_model`` training recipe
whose module never shipped (SURVEY.md §2.2 caveat); this is a fresh
implementation of the standard Conformer block (Gulati et al. 2020):
half-step feed-forward -> relative-positional MHSA -> depthwise conv module
-> half-step feed-forward -> LayerNorm, drop-in compatible with the
transformer encoder's (src, padding_mask) interface.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from emg_tpu.models.attention import MultiHeadAttention


class ConvModule(nn.Module):
    d_model: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, padding_mask, deterministic: bool):
        # x: (B, T, D); zero padded positions so the depthwise conv does not
        # leak across utterance boundaries
        h = nn.LayerNorm()(x)
        h = jnp.where(padding_mask[:, :, None], 0.0, h)
        h = nn.Dense(2 * self.d_model, name="pointwise_in")(h)
        h = nn.glu(h, axis=-1)
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(
            self.d_model,
            (self.kernel_size,),
            padding=[(pad, pad)],
            feature_group_count=self.d_model,
            name="depthwise",
        )(h)
        h = nn.LayerNorm(name="conv_norm")(h)
        h = nn.swish(h)
        h = nn.Dense(self.d_model, name="pointwise_out")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ConformerBlock(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float
    relative_positional_distance: int
    conv_kernel_size: int

    @nn.compact
    def __call__(self, x, padding_mask, deterministic: bool):
        def ff(name):
            def apply(v):
                h = nn.LayerNorm(name=f"{name}_norm")(v)
                h = nn.Dense(self.d_ff, name=f"{name}_in")(h)
                h = nn.swish(h)
                h = nn.Dropout(self.dropout, name=f"{name}_drop1")(h, deterministic=deterministic)
                h = nn.Dense(self.d_model, name=f"{name}_out")(h)
                return nn.Dropout(self.dropout, name=f"{name}_drop2")(h, deterministic=deterministic)

            return apply

        x = x + 0.5 * ff("ff1")(x)
        attn_in = nn.LayerNorm(name="attn_norm")(x)
        attn = MultiHeadAttention(
            self.d_model,
            self.num_heads,
            dropout=self.dropout,
            relative_positional=True,
            relative_positional_distance=self.relative_positional_distance,
            name="self_attn",
        )(
            attn_in, attn_in, attn_in,
            key_padding_mask=padding_mask,
            deterministic=deterministic,
        )
        x = x + nn.Dropout(self.dropout, name="attn_drop")(attn, deterministic=deterministic)
        x = x + ConvModule(
            self.d_model, self.conv_kernel_size, self.dropout, name="conv_module"
        )(x, padding_mask, deterministic)
        x = x + 0.5 * ff("ff2")(x)
        return nn.LayerNorm(name="final_norm")(x)


class ConformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    d_ff: int
    dropout: float
    relative_positional_distance: int
    conv_kernel_size: int = 31

    @nn.compact
    def __call__(self, src, src_padding_mask, deterministic: bool):
        for i in range(self.num_layers):
            src = ConformerBlock(
                self.d_model,
                self.num_heads,
                self.d_ff,
                self.dropout,
                self.relative_positional_distance,
                self.conv_kernel_size,
                name=f"layer{i}",
            )(src, src_padding_mask, deterministic)
        return src
