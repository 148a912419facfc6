"""Linear-interpolation resampling (np.interp parity).

The reference subsamples filtered EMG from 1000 Hz to 689.06 Hz (raw path)
and 516.79 Hz (feature path) with np.interp over a uniform grid
(reference read_emg.py:45-49). On device this is a gather + lerp with a
statically-known output length.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def subsample_length(n: int, new_freq: float, old_freq: float) -> int:
    """Output length of the reference's np.arange(0, (n-1)/old, 1/new) grid."""
    times_end = np.float64(n - 1) / np.float64(old_freq)
    return int(np.arange(0, times_end, 1.0 / np.float64(new_freq)).shape[0])


def subsample(x: jnp.ndarray, new_freq: float, old_freq: float) -> jnp.ndarray:
    """Resample axis 0 of ``x`` ((T,) or (T, C)) by linear interpolation."""
    n = x.shape[0]
    m = subsample_length(n, new_freq, old_freq)
    # sample positions in units of the input grid (float64 on host for the
    # same grid rounding as the reference)
    sample_times = np.arange(m, dtype=np.float64) / np.float64(new_freq)
    pos = sample_times * np.float64(old_freq)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n - 1)
    i1 = np.clip(i0 + 1, 0, n - 1)
    frac = (pos - i0).astype(np.float32)
    x0 = jnp.take(x, jnp.asarray(i0), axis=0)
    x1 = jnp.take(x, jnp.asarray(i1), axis=0)
    if x.ndim > 1:
        frac = frac.reshape((-1,) + (1,) * (x.ndim - 1))
    return x0 + (x1 - x0) * jnp.asarray(frac)


def subsample_masked(x: jnp.ndarray, n, new_freq: float, old_freq: float):
    """Dynamic-length subsample inside a fixed (T_max, ...) buffer.

    Interpolates as if the signal were x[:n]; rows at or beyond the output
    length (returned as the second element) are unspecified.
    """
    T = x.shape[0]
    M = subsample_length(T, new_freq, old_freq)  # max possible output length
    n = jnp.asarray(n, jnp.int32)
    # static interpolation grid, computed in float64 on host (jax may have
    # x64 disabled, which would silently degrade the sample positions)
    sample_times = np.arange(M, dtype=np.float64) / np.float64(new_freq)
    pos = sample_times * np.float64(old_freq)
    i0_static = np.floor(pos).astype(np.int64)
    frac_static = (pos - i0_static).astype(np.float32)
    frac = jnp.asarray(frac_static)
    # where i0 was clipped to n-1 the true position lies past the end;
    # with i0 == i1 == n-1 the lerp degenerates to x[n-1] regardless of frac
    if n.ndim == 0:
        i0 = jnp.clip(jnp.asarray(i0_static, jnp.int32), 0, n - 1)
        i1 = jnp.clip(i0 + 1, 0, n - 1)
        x0 = jnp.take(x, i0, axis=0)
        x1 = jnp.take(x, i1, axis=0)
    else:
        # per-column valid lengths (unequal-length utterances folded onto
        # the channel axis): (M, 1) grid broadcast against (C,) lengths
        assert x.ndim == 2 and n.shape == (x.shape[1],)
        i0 = jnp.clip(jnp.asarray(i0_static, jnp.int32)[:, None], 0, n[None, :] - 1)
        i1 = jnp.clip(i0 + 1, 0, n[None, :] - 1)
        x0 = jnp.take_along_axis(x, i0, axis=0)
        x1 = jnp.take_along_axis(x, i1, axis=0)
    if x.ndim > 1:
        frac = frac.reshape((-1,) + (1,) * (x.ndim - 1))
    out = x0 + (x1 - x0) * frac
    out_len = _masked_output_length(n, new_freq, old_freq)
    return out, out_len


def _masked_output_length(n, new_freq: float, old_freq: float):
    """len(np.arange(0, (n-1)/old_freq, 1/new_freq)) with a traced ``n``.

    Exact-rational ceil((n-1) * new/old) in int32-safe pieces: frequencies
    are expressed as (integer hundredths)/(old_freq*100), which covers the
    reference's 689.06 and 516.79 Hz targets without float64 (unavailable
    under jax's default x64-disabled config) or int32 overflow.
    """
    num = round(float(new_freq) * 100)
    den = round(float(old_freq) * 100)
    if (abs(num - float(new_freq) * 100) > 1e-9
            or abs(den - float(old_freq) * 100) > 1e-9
            or den % 1000 != 0):
        # fall back to float math for non-centihertz rates
        return jnp.ceil(
            (n - 1).astype(jnp.float32) / np.float32(old_freq) * np.float32(new_freq)
        ).astype(jnp.int32)
    a = (jnp.asarray(n, jnp.int32) - 1)
    a_hi, a_lo = a // 1000, a % 1000
    X = a_hi * num  # needs a_hi * num < 2^31: fine for n up to ~3e7
    Y = a_lo * num
    # ceil((X*1000 + Y) / (den*1000)); with den = old*100 and the reference's
    # old_freq = 1000 this is ceil((X + Y/1000) / (den/1000))
    scale = den // 1000  # e.g. 100000/1000 = 100
    W = X + Y // 1000
    s = Y % 1000
    q, r = W // scale, W % scale
    return q + ((r > 0) | (s > 0)).astype(jnp.int32)
