"""Time-domain EMG featurization on device.

Per channel the reference computes five frame-level time-domain features and
a 16-point STFT magnitude over frames of length 16 / hop 6 (center=False):
low-frequency envelope mean ``w_h``, envelope power ``p_w``, rectified
high-frequency power ``p_r``, zero-crossing rate ``z_p``, rectified mean
``r_h``, plus 9 STFT bins — 14 features x 8 channels = 112 dims
(reference data_utils.py:92-143). The implementation below is one fused
jit-compiled function operating on all channels at once: framing is a
strided gather, the envelope is two 9-tap same-mode convolutions, and the
STFT is a single rfft over framed windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

FRAME_LENGTH = 16
HOP_LENGTH = 6
N_FFT = 16
ZCR_THRESHOLD = 1e-10


def n_frames(n: int) -> int:
    """Number of center=False frames of length 16 / hop 6."""
    return 1 + (n - FRAME_LENGTH) // HOP_LENGTH


@functools.lru_cache(maxsize=None)
def _hann_window(n: int) -> np.ndarray:
    # periodic Hann (fftbins=True), as used by librosa.stft's default window
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def _frame(x: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """Frame axis 0 of (T, C) into (num_frames, FRAME_LENGTH, C)."""
    starts = jnp.arange(num_frames) * HOP_LENGTH
    idx = starts[:, None] + jnp.arange(FRAME_LENGTH)[None, :]
    return jnp.take(x, idx, axis=0)


def double_average(x: jnp.ndarray, n=None) -> jnp.ndarray:
    """Two passes of a 9-tap moving average, 'same' mode per pass
    (reference data_utils.py:92-97). x: (T, C).

    When ``n`` is given, each pass behaves as if the signal ended at row
    ``n`` (the 'same'-mode zero padding starts there), which is NOT the
    same as convolving the longer zero-tailed buffer: the first pass
    spills nonzero values past ``n`` that the exact computation never
    sees, so they must be re-zeroed between passes.
    """
    kernel = jnp.full((9,), 1.0 / 9.0, x.dtype)
    mask = None if n is None else (jnp.arange(x.shape[0]) < n)[:, None]

    def smooth(v):  # v: (T,)
        return jnp.convolve(v, kernel, mode="same")

    smooth_cols = jax.vmap(smooth, in_axes=1, out_axes=1)
    v = smooth_cols(x)
    if mask is not None:
        v = jnp.where(mask, v, 0.0)
    return smooth_cols(v)


def get_emg_features(emg: jnp.ndarray) -> jnp.ndarray:
    """(T, C) filtered+resampled EMG -> (n_frames(T), 14*C) float32 features.

    Feature order per channel matches the reference: the 5 TD features then
    the 9 STFT magnitude bins, channels concatenated in order.
    """
    x = emg - jnp.mean(emg, axis=0, keepdims=True)
    return _features_centered(x)


def get_emg_features_masked(emg: jnp.ndarray, n) -> tuple:
    """Dynamic-length variant over a fixed (T_max, C) buffer.

    Returns (features, num_valid_frames); rows past the count are computed
    from junk samples and must be masked by the caller.
    """
    valid = 1 + (jnp.asarray(n, jnp.int32) - FRAME_LENGTH) // HOP_LENGTH
    # mean-center with a masked mean and zero the tail so the valid feature
    # rows match the exact-length computation (np.convolve 'same' zero-pads,
    # which the zeroed tail reproduces)
    T, C = emg.shape
    mask = (jnp.arange(T) < n)[:, None]
    mean = jnp.sum(jnp.where(mask, emg, 0.0), axis=0, keepdims=True) / jnp.asarray(
        n, emg.dtype
    )
    x = jnp.where(mask, emg - mean, 0.0)
    feats = _features_centered(x, n=n)
    return feats, valid


def _features_centered(x: jnp.ndarray, n=None) -> jnp.ndarray:
    """Feature computation after mean-centering (shared core)."""
    T, C = x.shape
    F = n_frames(T)
    w = double_average(x, n=n)
    p = x - w
    r = jnp.abs(p)
    fw = _frame(w, F)
    fp = _frame(p, F)
    fr = _frame(r, F)
    fx = _frame(x, F)
    w_h = jnp.mean(fw, axis=1)
    p_w = jnp.sqrt(jnp.mean(fw * fw, axis=1))
    p_r = jnp.sqrt(jnp.mean(fr * fr, axis=1))
    r_h = jnp.mean(fr, axis=1)
    p_z = jnp.where(jnp.abs(fp) <= ZCR_THRESHOLD, 0.0, fp)
    sign = jnp.signbit(p_z)
    d = sign[:, 1:, :] != sign[:, :-1, :]
    crossings = jnp.concatenate([d[:, :1, :], d], axis=1)
    z_p = jnp.mean(crossings.astype(jnp.float32), axis=1)
    window = jnp.asarray(_hann_window(N_FFT), x.dtype)
    s = jnp.abs(jnp.fft.rfft(fx * window[None, :, None], n=N_FFT, axis=1))
    td = jnp.stack([w_h, p_w, p_r, z_p, r_h], axis=1)
    feats = jnp.concatenate([td, s], axis=1)
    feats = jnp.transpose(feats, (0, 2, 1)).reshape(F, 14 * C)
    return feats.astype(jnp.float32)
