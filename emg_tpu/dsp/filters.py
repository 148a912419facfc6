"""Zero-phase IIR filtering on TPU with scipy.signal.filtfilt semantics.

The reference front-end runs, per EMG channel, seven 60 Hz-harmonic notch
filters (Q=30 biquads) followed by a 3rd-order 2 Hz Butterworth high-pass,
each applied forward-backward with scipy's default odd-extension edge
handling (reference read_emg.py:32-43). Here the filters are designed on
host (scipy, float64) and *executed* on device as associative-scan linear
recurrences (see emg_tpu.dsp.recurrence), vectorized over channels, with
both static-length and masked dynamic-length entry points so one compiled
kernel serves a whole bucket of utterance lengths.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal


# ---------------------------------------------------------------------------
# Host-side filter design (tiny, float64, cached)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def design_highpass(order: int = 3, cutoff: float = 2.0, fs: float = 1000.0):
    b, a = scipy.signal.butter(order, cutoff, "highpass", fs=fs)
    return np.asarray(b), np.asarray(a)


@functools.lru_cache(maxsize=None)
def design_notch(freq: float, q: float = 30.0, fs: float = 1000.0):
    b, a = scipy.signal.iirnotch(freq, q, fs)
    return np.asarray(b), np.asarray(a)


@functools.lru_cache(maxsize=None)
def _filter_constants(b_key: tuple, a_key: tuple):
    """Precompute the DF2T recurrence in diagonalized (eigen) form.

    Returns (A, g, b0, zi, lam, w_in, c_out) where the filter state evolves
    as w[t] = lam*w[t-1] + w_in*x[t] in the eigenbasis, the DF2T state is
    recovered via z = V w, and y[t] = b0*x[t] + Re(c_out . w[t-1]).
    """
    b = np.asarray(b_key, dtype=np.float64)
    a = np.asarray(a_key, dtype=np.float64)
    b = b / a[0]
    a = a / a[0]
    m = max(len(a), len(b)) - 1
    b = np.concatenate([b, np.zeros(m + 1 - len(b))])
    a = np.concatenate([a, np.zeros(m + 1 - len(a))])
    # Direct-form II transposed:
    #   y[t]   = b0 x[t] + z0[t-1]
    #   z_i[t] = b_{i+1} x[t] + z_{i+1}[t-1] - a_{i+1} y[t]
    # substituting y gives z[t] = A z[t-1] + g x[t]
    A = np.zeros((m, m))
    for i in range(m):
        A[i, 0] = -a[i + 1]
        if i + 1 < m:
            A[i, i + 1] += 1.0
    g = b[1:] - a[1:] * b[0]
    zi = scipy.signal.lfilter_zi(b, a)
    lam, V = np.linalg.eig(A)
    assert np.abs(lam).max() < 1.0, "unstable filter"
    Vinv = np.linalg.inv(V)
    w_in = Vinv @ g.astype(np.complex128)
    c_out = V[0, :]
    return A, g, float(b[0]), zi, lam, w_in, c_out, Vinv


def _key(arr) -> tuple:
    return tuple(np.asarray(arr, dtype=np.float64).tolist())


# ---------------------------------------------------------------------------
# Device-side execution
# ---------------------------------------------------------------------------

class _DeviceFilter:
    """Device-ready constants for one (b, a) filter, split real/imag
    (fused complex arithmetic hits unimplemented TPU lowerings)."""

    def __init__(self, b, a):
        A, g, b0, zi, lam, w_in, c_out, Vinv = _filter_constants(_key(b), _key(a))
        self.m = A.shape[0]
        self.b0 = b0
        self.zi_np = zi
        self.lam_r = jnp.asarray(np.real(lam), jnp.float32)
        self.lam_i = jnp.asarray(np.imag(lam), jnp.float32)
        self.w_in_r = jnp.asarray(np.real(w_in), jnp.float32)
        self.w_in_i = jnp.asarray(np.imag(w_in), jnp.float32)
        self.c_out_r = jnp.asarray(np.real(c_out), jnp.float32)
        self.c_out_i = jnp.asarray(np.imag(c_out), jnp.float32)
        self.Vinv_r = jnp.asarray(np.real(Vinv), jnp.float32)
        self.Vinv_i = jnp.asarray(np.imag(Vinv), jnp.float32)


def _lfilter_core(flt: _DeviceFilter, x, z_init):
    """x: (T, C) float32; z_init: (C, m) float32 DF2T state. Returns (T, C).

    The recurrence runs in (C, m, T) layout — time in TPU lanes — because
    the state size m (2-3) would otherwise occupy the 128-wide lane
    dimension and waste ~50x HBM bandwidth. All arithmetic is split
    real/imaginary float32.
    """
    from emg_tpu.dsp.recurrence import _hillis_steele_affine_last

    T, C = x.shape
    m = flt.m
    xt = x.T  # (C, T) float32
    ur = xt[:, None, :] * flt.w_in_r[None, :, None]  # (C, m, T)
    ui = xt[:, None, :] * flt.w_in_i[None, :, None]
    # w_init = Vinv @ z_init (per channel): (C, m) complex, z_init real.
    # m is 2-3, so contract elementwise on the VPU — MXU matmuls default to
    # bfloat16, which the ill-conditioned eigenbasis amplifies badly.
    w0_r = jnp.sum(z_init[:, None, :] * flt.Vinv_r[None, :, :], axis=2)
    w0_i = jnp.sum(z_init[:, None, :] * flt.Vinv_i[None, :, :], axis=2)

    from emg_tpu.ops.pallas.iir_scan import iir_scan

    def pallas_path(ur, ui, w0_r, w0_i):
        # One HBM read/write with the in-chunk scan in VMEM (~400x the XLA
        # doubling scan on v5e). Rows are (channel, state) pairs, lanes are
        # time; the tail is zero-padded to the block size (the scan is
        # causal, so the padding never affects real outputs).
        from emg_tpu.ops.pallas.iir_scan import pick_block

        Tp0 = ((T + 511) // 512) * 512
        bt = pick_block(C * m, Tp0)
        Tp = ((T + bt - 1) // bt) * bt
        ur2 = jnp.pad(ur.reshape(C * m, T), ((0, 0), (0, Tp - T)))
        ui2 = jnp.pad(ui.reshape(C * m, T), ((0, 0), (0, Tp - T)))
        lam_r = jnp.broadcast_to(flt.lam_r[None, :], (C, m)).reshape(C * m)
        lam_i = jnp.broadcast_to(flt.lam_i[None, :], (C, m)).reshape(C * m)
        wr2, wi2 = iir_scan(
            lam_r, lam_i, ur2, ui2, w0_r.reshape(C * m), w0_i.reshape(C * m), bt=bt
        )
        return wr2[:, :T].reshape(C, m, T), wi2[:, :T].reshape(C, m, T)

    def xla_path(ur, ui, w0_r, w0_i):
        lr = jnp.broadcast_to(flt.lam_r[None, :, None], (C, m, T))
        li = jnp.broadcast_to(flt.lam_i[None, :, None], (C, m, T))
        pr, pi, br, bi = _hillis_steele_affine_last(lr, li, ur, ui)
        wr = pr * w0_r[:, :, None] - pi * w0_i[:, :, None] + br
        wi = pr * w0_i[:, :, None] + pi * w0_r[:, :, None] + bi
        return wr, wi

    # resolved at lowering time per backend, so jit'ing under a CPU
    # default_device on a TPU host picks the right implementation
    wr, wi = jax.lax.platform_dependent(
        ur, ui, w0_r, w0_i,
        tpu=pallas_path,
        default=xla_path,
    )

    # z0[t] = Re(c_out . w[t]) per channel — elementwise VPU contraction
    z0 = jnp.sum(
        wr * flt.c_out_r[None, :, None] - wi * flt.c_out_i[None, :, None], axis=1
    )
    z0_init = jnp.sum(w0_r * flt.c_out_r[None, :] - w0_i * flt.c_out_i[None, :], axis=1)
    z0_prev = jnp.concatenate([z0_init[:, None], z0[:, :-1]], axis=1)
    return flt.b0 * x + z0_prev.T


def lfilter(b, a, x: jnp.ndarray, zi: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """scipy.signal.lfilter along axis 0 of ``x`` with shape (T,) or (T, C)."""
    flt = _DeviceFilter(b, a)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    C = xf.shape[1]
    if zi is None:
        z_init = jnp.zeros((C, flt.m), jnp.float32)
    else:
        z_init = jnp.broadcast_to(jnp.asarray(zi, jnp.float32), (C, flt.m))
    y = _lfilter_core(flt, xf, z_init)
    y = y.astype(dtype)
    return y[:, 0] if squeeze else y


def _default_padlen(b, a) -> int:
    return 3 * max(len(np.atleast_1d(a)), len(np.atleast_1d(b)))


def filtfilt(b, a, x: jnp.ndarray, padlen: Optional[int] = None) -> jnp.ndarray:
    """Zero-phase filtering matching scipy.signal.filtfilt defaults
    (method='pad', padtype='odd')."""
    flt = _DeviceFilter(b, a)
    if padlen is None:
        padlen = _default_padlen(b, a)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    T, C = xf.shape
    if T <= padlen:
        raise ValueError(f"input length {T} must exceed padlen {padlen}")

    # odd extension at both edges
    left = 2.0 * xf[0] - xf[1 : padlen + 1][::-1]
    right = 2.0 * xf[-1] - xf[-padlen - 1 : -1][::-1]
    ext = jnp.concatenate([left, xf, right], axis=0)

    zij = jnp.asarray(flt.zi_np, jnp.float32)
    z0 = zij[None, :] * ext[0][:, None]
    y = _lfilter_core(flt, ext, z0)
    y = y[::-1]
    z0 = zij[None, :] * y[0][:, None]
    y = _lfilter_core(flt, y, z0)
    y = y[::-1]
    y = y[padlen : padlen + T]
    y = y.astype(dtype)
    return y[:, 0] if squeeze else y


def filtfilt_masked(b, a, x: jnp.ndarray, n, padlen: Optional[int] = None) -> jnp.ndarray:
    """filtfilt over the first ``n`` rows of a fixed-size (T_max, C) buffer.

    ``n`` may be a traced scalar, or a traced (C,) vector giving an
    independent valid length per column — the layout used to batch
    unequal-length utterances by folding them onto the channel axis (the
    IIR recurrence is causal and per-row independent, so one Pallas scan
    call serves the whole fold; only these edge-extension/reversal gathers
    are length-dependent). The result has the same static shape as ``x``
    with rows [0, n) of each column equal to scipy.signal.filtfilt of that
    column's x[:n]; the remaining rows are unspecified.
    """
    flt = _DeviceFilter(b, a)
    if padlen is None:
        padlen = _default_padlen(b, a)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    T, C = xf.shape
    n = jnp.asarray(n, jnp.int32)
    p = padlen
    Text = T + 2 * p

    if n.ndim == 0:
        t = jnp.arange(Text, dtype=jnp.int32)
        # extended-signal index map: odd extension left of 0 and right of n
        #   t < p:          ext[t] = 2*x[0] - x[p - t]
        #   p <= t < n+p:   ext[t] = x[t - p]
        #   n+p <= t:       ext[t] = 2*x[n-1] - x[2n - 2 - (t - p)]
        mid_idx = t - p
        left_idx = p - t
        right_idx = 2 * n - 2 - (t - p)
        idx = jnp.where(t < p, left_idx, jnp.where(t < n + p, mid_idx, right_idx))
        idx = jnp.clip(idx, 0, T - 1)
        gathered = jnp.take(xf, idx, axis=0)
        xn1 = jnp.take(xf, jnp.clip(n - 1, 0, T - 1), axis=0)
        sign = jnp.where((t < p) | (t >= n + p), -1.0, 1.0)[:, None]
        base = jnp.where(t[:, None] < p, 2.0 * xf[0][None, :],
                         jnp.where(t[:, None] >= n + p, 2.0 * xn1[None, :], 0.0))
        ext = base + sign * gathered
        valid_len = n + 2 * p  # true extended length; positions beyond are junk
        rev_idx = jnp.clip(valid_len - 1 - t, 0, Text - 1)

        def rev(arr):
            return jnp.take(arr, rev_idx, axis=0)

        first = lambda arr: arr[0]
    else:
        assert n.shape == (C,), f"per-column lengths must be ({C},), got {n.shape}"
        t = jnp.arange(Text, dtype=jnp.int32)[:, None]  # (Text, 1) vs n (C,)
        mid_idx = jnp.broadcast_to(t - p, (Text, C))
        left_idx = jnp.broadcast_to(p - t, (Text, C))
        right_idx = 2 * n[None, :] - 2 - (t - p)
        idx = jnp.where(t < p, left_idx, jnp.where(t < n[None, :] + p, mid_idx, right_idx))
        idx = jnp.clip(idx, 0, T - 1)
        gathered = jnp.take_along_axis(xf, idx, axis=0)
        xn1 = jnp.take_along_axis(xf, jnp.clip(n - 1, 0, T - 1)[None, :], axis=0)[0]
        sign = jnp.where((t < p) | (t >= n[None, :] + p), -1.0, 1.0)
        base = jnp.where(t < p, 2.0 * xf[0][None, :],
                         jnp.where(t >= n[None, :] + p, 2.0 * xn1[None, :], 0.0))
        ext = base + sign * gathered
        valid_len = n + 2 * p  # (C,)
        rev_idx = jnp.clip(valid_len[None, :] - 1 - t, 0, Text - 1)

        def rev(arr):
            return jnp.take_along_axis(arr, rev_idx, axis=0)

        first = lambda arr: arr[0]

    zij = jnp.asarray(flt.zi_np, jnp.float32)
    z0 = zij[None, :] * first(ext)[:, None]
    y = _lfilter_core(flt, ext, z0)  # causal: [0, valid_len) correct

    # reverse the first valid_len rows into the front of the buffer
    y_rev = rev(y)
    z0 = zij[None, :] * first(y_rev)[:, None]
    y2 = _lfilter_core(flt, y_rev, z0)
    y2_rev = rev(y2)

    out = y2_rev[p : p + T]
    out = out.astype(dtype)
    return out[:, 0] if squeeze else out


# ---------------------------------------------------------------------------
# The reference front-end's specific chains
# ---------------------------------------------------------------------------

def remove_drift(x: jnp.ndarray, fs: float = 1000.0, n=None) -> jnp.ndarray:
    """3rd-order 2 Hz high-pass, zero-phase (reference read_emg.py:32-34)."""
    b, a = design_highpass(3, 2.0, fs)
    if n is None:
        return filtfilt(b, a, x)
    return filtfilt_masked(b, a, x, n)


def notch(x: jnp.ndarray, freq: float, fs: float = 1000.0, n=None) -> jnp.ndarray:
    """Q=30 notch, zero-phase (reference read_emg.py:36-38)."""
    b, a = design_notch(freq, 30.0, fs)
    if n is None:
        return filtfilt(b, a, x)
    return filtfilt_masked(b, a, x, n)


def notch_harmonics(x: jnp.ndarray, freq: float = 60.0, fs: float = 1000.0, n=None) -> jnp.ndarray:
    """Notch at harmonics 1..7 of ``freq`` (reference read_emg.py:40-43)."""
    for harmonic in range(1, 8):
        x = notch(x, freq * harmonic, fs, n=n)
    return x
