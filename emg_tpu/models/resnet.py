"""Stride-8 ResBlock CNN over packed raw-EMG rows, with masked BatchNorm.

Topology matches the reference ResBlock stack (architecture.py:22-58):
three blocks of [conv3-s BN ReLU conv3 BN] + (1x1-s conv BN) residual with
a final ReLU, channels 8 -> d_model, strides 2,2,2. BatchNorm statistics
are computed over the *valid* packed rows only (the reference computes BN
over exactly the packed rows of the batch — including the 42.0 padding fill
inside the last row and cross-utterance content, which we reproduce — but
our batches are padded up to a bucketed row count, and those extra rows
must not contaminate the statistics).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over (rows, time, channels) with a valid-row count.

    torch semantics: biased variance for normalization, unbiased for the
    running average, momentum 0.1, eps 1e-5. Statistics accumulate in
    float32 in ONE pass over the activations (sum and sum-of-squares
    together) rather than the textbook two, halving the reduction traffic
    over the conv stack's biggest tensors. The sums are taken over
    MEAN-SHIFTED values — a per-channel offset estimated from the first
    (always-valid) row — so channels with |mean| >> std don't
    catastrophically cancel in E[x^2] - E[x]^2 (the shift costs one small
    (L, C) reduction, not a second full pass). The normalization returns
    at the input dtype so a bfloat16 conv stream stays bfloat16.
    """

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, n_valid_rows, use_running_average: bool):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(C))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(C))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            N, L, _ = x.shape
            row_ids = jnp.arange(N)
            mask = (row_ids < n_valid_rows)[:, None, None]
            count = jnp.maximum(n_valid_rows * L, 1).astype(jnp.float32)
            # per-channel shift from row 0 (always valid): with c near the
            # true mean, E[(x-c)^2] - E[x-c]^2 is numerically stable where
            # the unshifted form cancels for |mean| >> std channels
            c = jnp.mean(x[0].astype(jnp.float32), axis=0)
            xm = jnp.where(mask, x.astype(jnp.float32) - c, 0.0)
            mean_s = jnp.sum(xm, axis=(0, 1)) / count
            sq = jnp.sum(xm * xm, axis=(0, 1)) / count
            var = jnp.maximum(sq - mean_s * mean_s, 0.0)
            mean = mean_s + c
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x.astype(jnp.float32) - mean) / jnp.sqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class ResBlock(nn.Module):
    num_outs: int
    stride: int = 1
    dtype: Any = jnp.float32  # conv compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, n_valid_rows, use_running_average: bool):
        # x: (rows, time, channels_in)
        num_ins = x.shape[-1]
        h = nn.Conv(
            self.num_outs, (3,), strides=(self.stride,), padding=[(1, 1)],
            dtype=self.dtype, name="conv1",
        )(x)
        h = MaskedBatchNorm(name="bn1")(h, n_valid_rows, use_running_average)
        h = nn.relu(h)
        h = nn.Conv(self.num_outs, (3,), padding=[(1, 1)], dtype=self.dtype,
                    name="conv2")(h)
        h = MaskedBatchNorm(name="bn2")(h, n_valid_rows, use_running_average)

        if self.stride != 1 or num_ins != self.num_outs:
            res = nn.Conv(
                self.num_outs, (1,), strides=(self.stride,), padding="VALID",
                dtype=self.dtype, name="residual_path",
            )(x)
            res = MaskedBatchNorm(name="res_norm")(res, n_valid_rows, use_running_average)
        else:
            res = x
        return nn.relu(h + res)


class ConvStack(nn.Module):
    """Three stride-2 ResBlocks: time /8, channels 8 -> d_model.

    ``dtype`` is the conv compute dtype: bfloat16 runs the conv matmuls at
    the fast MXU rate and halves activation traffic (BN statistics still
    accumulate float32); float32 preserves reference-exact numerics.
    """

    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, n_valid_rows, use_running_average: bool):
        x = x.astype(self.dtype)
        x = ResBlock(self.d_model, 2, dtype=self.dtype, name="block0")(x, n_valid_rows, use_running_average)
        x = ResBlock(self.d_model, 2, dtype=self.dtype, name="block1")(x, n_valid_rows, use_running_average)
        x = ResBlock(self.d_model, 2, dtype=self.dtype, name="block2")(x, n_valid_rows, use_running_average)
        return x
