"""Fused per-utterance EMG preprocessing: filters -> resample -> features.

One jit-compiled function covering the reference's load_utterance DSP chain
(read_emg.py:57-93): 60 Hz-harmonic notches + drift high-pass over the
neighbor-extended signal, context strip, dual-rate resample (689.06 Hz raw
path, 516.79 Hz feature path), and 112-dim featurization. Compiled once per
length bucket via the masked dynamic-length kernels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from emg_tpu.dsp import filters
from emg_tpu.dsp.features import (
    FRAME_LENGTH,
    HOP_LENGTH,
    get_emg_features,
    get_emg_features_masked,
)
from emg_tpu.dsp.resample import subsample_masked

RAW_RATE = 689.06
FEAT_RATE = 516.79
SOURCE_RATE = 1000.0


class Preprocessed(NamedTuple):
    emg_features: jnp.ndarray  # (F_max, 112) — valid rows [0, n_frames)
    emg: jnp.ndarray  # (T_feat_max, C) 516.79 Hz signal
    emg_orig: jnp.ndarray  # (T_raw_max, C) 689.06 Hz signal
    n_frames: jnp.ndarray  # ()
    n_feat: jnp.ndarray  # () valid rows of emg
    n_raw: jnp.ndarray  # () valid rows of emg_orig


@functools.partial(jax.jit, static_argnames=("remove_channels",))
def preprocess_emg(
    x: jnp.ndarray,
    n_total,
    n_before,
    n_after,
    remove_channels: tuple = (),
) -> Preprocessed:
    """Filter + resample + featurize one utterance.

    Args:
      x: (T_max, C) raw 1000 Hz EMG: neighbor-before ++ utterance ++
         neighbor-after, zero-padded to the bucket length T_max.
      n_total: total valid samples (before+utterance+after).
      n_before / n_after: context sample counts stripped after filtering.
      remove_channels: channel indices zeroed after resampling
        (reference read_emg.py:79-81).
    """
    n_total = jnp.asarray(n_total, jnp.int32)
    n_before = jnp.asarray(n_before, jnp.int32)
    n_after = jnp.asarray(n_after, jnp.int32)

    y = filters.notch_harmonics(x, 60.0, SOURCE_RATE, n=n_total)
    y = filters.remove_drift(y, SOURCE_RATE, n=n_total)

    # strip the neighbor context: shift rows up by n_before
    T = y.shape[0]
    idx = jnp.clip(jnp.arange(T) + n_before, 0, T - 1)
    y = jnp.take(y, idx, axis=0)
    n_mid = n_total - n_before - n_after

    emg_orig, n_raw = subsample_masked(y, n_mid, RAW_RATE, SOURCE_RATE)
    emg, n_feat = subsample_masked(y, n_mid, FEAT_RATE, SOURCE_RATE)

    for c in remove_channels:
        emg = emg.at[:, int(c)].set(0.0)
        emg_orig = emg_orig.at[:, int(c)].set(0.0)

    feats, n_frames = get_emg_features_masked(emg, n_feat)
    return Preprocessed(feats, emg, emg_orig, n_frames, n_feat, n_raw)


@functools.partial(jax.jit, static_argnames=("remove_channels",))
def preprocess_emg_batched(
    xs: jnp.ndarray,
    n_totals,
    n_befores,
    n_afters,
    remove_channels: tuple = (),
) -> Preprocessed:
    """Filter + resample + featurize a batch of UNEQUAL-length utterances.

    Args:
      xs: (U, T_max, C) raw 1000 Hz EMG buffers, zero-padded per utterance.
      n_totals / n_befores / n_afters: (U,) per-utterance sample counts.

    The U utterances fold onto the channel axis — (T_max, U*C) — so the
    sequential-carry IIR scan runs once over U*C*m independent rows instead
    of a slow vmap over per-utterance calls; the length-dependent edge
    extensions, reversals and resampling use per-column valid lengths
    (filters.filtfilt_masked / resample.subsample_masked vector-n paths).
    Featurization has no sequential carry, so it vmaps per utterance.
    Returns a Preprocessed whose fields all carry a leading U axis.
    """
    U, T, C = xs.shape
    n_totals = jnp.asarray(n_totals, jnp.int32)
    n_befores = jnp.asarray(n_befores, jnp.int32)
    n_afters = jnp.asarray(n_afters, jnp.int32)

    folded = jnp.transpose(xs, (1, 0, 2)).reshape(T, U * C)
    n_cols = jnp.repeat(n_totals, C)

    y = filters.notch_harmonics(folded, 60.0, SOURCE_RATE, n=n_cols)
    y = filters.remove_drift(y, SOURCE_RATE, n=n_cols)

    # strip the neighbor context per column: shift rows up by n_before
    idx = jnp.clip(
        jnp.arange(T, dtype=jnp.int32)[:, None] + jnp.repeat(n_befores, C)[None, :],
        0, T - 1,
    )
    y = jnp.take_along_axis(y, idx, axis=0)
    n_mid = n_totals - n_befores - n_afters  # (U,)
    n_mid_cols = jnp.repeat(n_mid, C)

    emg_orig_f, n_raw_cols = subsample_masked(y, n_mid_cols, RAW_RATE, SOURCE_RATE)
    emg_f, n_feat_cols = subsample_masked(y, n_mid_cols, FEAT_RATE, SOURCE_RATE)

    emg_orig = jnp.transpose(emg_orig_f.reshape(-1, U, C), (1, 0, 2))  # (U, T', C)
    emg = jnp.transpose(emg_f.reshape(-1, U, C), (1, 0, 2))
    n_raw = n_raw_cols[::C]
    n_feat = n_feat_cols[::C]

    for c in remove_channels:
        emg = emg.at[:, :, int(c)].set(0.0)
        emg_orig = emg_orig.at[:, :, int(c)].set(0.0)

    feats, n_frames = jax.vmap(get_emg_features_masked)(emg, n_feat)
    return Preprocessed(feats, emg, emg_orig, n_frames, n_feat, n_raw)


def align_lengths(n_frames: int):
    """The reference's post-featurization alignment (read_emg.py:88-93):
    emg keeps rows [6, 6+6*F), emg_orig keeps rows [8, 8+8*F)."""
    return (6, 6 * n_frames), (8, 8 * n_frames)


def preprocess_emg_host(
    raw_emg: np.ndarray,
    before: np.ndarray,
    after: np.ndarray,
    remove_channels=(),
    max_frames: int = None,
):
    """Convenience host wrapper for exact-length (non-bucketed) use.

    Returns (emg_features, emg, emg_orig) with the reference's slicing and
    frame alignment applied, as float32 numpy arrays.
    """
    x = np.concatenate([before, raw_emg, after], axis=0).astype(np.float32)
    n_total = x.shape[0]
    out = preprocess_emg(
        jnp.asarray(x),
        n_total,
        before.shape[0],
        after.shape[0],
        tuple(remove_channels),
    )
    F = int(out.n_frames)
    if max_frames is not None:
        F = min(F, max_frames)
    feats = np.asarray(out.emg_features)[:F]
    (e0, elen), (r0, rlen) = align_lengths(F)
    emg = np.asarray(out.emg)[e0 : e0 + elen]
    emg_orig = np.asarray(out.emg_orig)[r0 : r0 + rlen]
    return feats, emg, emg_orig.astype(np.float32)
