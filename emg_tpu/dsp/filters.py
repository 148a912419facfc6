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


def _lfilter_core(flt: _DeviceFilter, x, z_init, reverse: bool = False,
                  inject_pos=None, inject_wr=None, inject_wi=None):
    """x: (T, C) float32; z_init: (C, m) float32 DF2T state. Returns (T, C).

    The recurrence runs in (C, m, T) layout — time in TPU lanes — because
    the state size m (2-3) would otherwise occupy the 128-wide lane
    dimension and waste ~50x HBM bandwidth. All arithmetic is split
    real/imaginary float32.

    ``reverse=True`` runs the anti-causal mirror w[t] = lam w[t+1] + u[t]
    (the zero-phase backward pass without reversing the data); it requires
    ``z_init == 0`` — dynamic-position initial states enter through
    ``inject_pos`` (a (C,) row index per column) with eigen-space values
    ``inject_wr/wi`` (C, m), added to the scan input so that
    w[inject_pos] == inject_w exactly (all u at and beyond inject_pos must
    be zero, which the masked filtfilt guarantees).
    """
    from emg_tpu.dsp.recurrence import _hillis_steele_affine_last

    T, C = x.shape
    m = flt.m
    xt = x.T  # (C, T) float32
    ur = xt[:, None, :] * flt.w_in_r[None, :, None]  # (C, m, T)
    ui = xt[:, None, :] * flt.w_in_i[None, :, None]
    if inject_pos is not None:
        # dynamic-position state injection via broadcast-compare (no scatter)
        hit = (
            jnp.arange(T, dtype=jnp.int32)[None, None, :]
            == inject_pos[:, None, None]
        )
        ur = jnp.where(hit, inject_wr[:, :, None], ur)
        ui = jnp.where(hit, inject_wi[:, :, None], ui)
    # w_init = Vinv @ z_init (per channel): (C, m) complex, z_init real.
    # m is 2-3, so contract elementwise on the VPU — MXU matmuls default to
    # bfloat16, which the ill-conditioned eigenbasis amplifies badly.
    w0_r = jnp.sum(z_init[:, None, :] * flt.Vinv_r[None, :, :], axis=2)
    w0_i = jnp.sum(z_init[:, None, :] * flt.Vinv_i[None, :, :], axis=2)

    from emg_tpu.ops.pallas.iir_scan import iir_scan

    def pallas_path(ur, ui, w0_r, w0_i):
        # One HBM read/write with the in-chunk scan in VMEM (~400x the XLA
        # doubling scan on v5e). Rows are (channel, state) pairs, lanes are
        # time; the tail is zero-padded to the block size (the scan padding
        # is zeros, so it never affects real outputs in either direction —
        # anti-causal scans enter the data through a zero-state pad tail).
        from emg_tpu.ops.pallas.iir_scan import pick_block

        Tp0 = ((T + 511) // 512) * 512
        bt = pick_block(C * m, Tp0)
        Tp = ((T + bt - 1) // bt) * bt
        ur2 = jnp.pad(ur.reshape(C * m, T), ((0, 0), (0, Tp - T)))
        ui2 = jnp.pad(ui.reshape(C * m, T), ((0, 0), (0, Tp - T)))
        lam_r = jnp.broadcast_to(flt.lam_r[None, :], (C, m)).reshape(C * m)
        lam_i = jnp.broadcast_to(flt.lam_i[None, :], (C, m)).reshape(C * m)
        wr2, wi2 = iir_scan(
            lam_r, lam_i, ur2, ui2, w0_r.reshape(C * m), w0_i.reshape(C * m),
            bt=bt, reverse=reverse,
        )
        return wr2[:, :T].reshape(C, m, T), wi2[:, :T].reshape(C, m, T)

    def xla_path(ur, ui, w0_r, w0_i):
        lr = jnp.broadcast_to(flt.lam_r[None, :, None], (C, m, T))
        li = jnp.broadcast_to(flt.lam_i[None, :, None], (C, m, T))
        pr, pi, br, bi = _hillis_steele_affine_last(lr, li, ur, ui, reverse=reverse)
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
    if reverse:
        # y[t] = b0 x[t] + Re(c_out . w[t+1]); w[T] = z_init-state (zero)
        z0_adj = jnp.concatenate([z0[:, 1:], z0_init[:, None]], axis=1)
    else:
        z0_adj = jnp.concatenate([z0_init[:, None], z0[:, :-1]], axis=1)
    return flt.b0 * x + z0_adj.T


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
    IIR recurrence is per-row independent, so one Pallas scan call serves
    the whole fold). The result has the same static shape as ``x`` with
    rows [0, n) of each column equal to scipy.signal.filtfilt of that
    column's x[:n]; the remaining rows are unspecified.

    Everything stays front-aligned: the backward pass runs as an
    ANTI-CAUSAL scan (iir_scan reverse=True) on the forward output with its
    junk tail zeroed and the scipy ``zi * y[valid-1]`` initial state
    injected at the valid boundary — no full-height reversal or
    odd-extension gathers (take_along_axis row gathers are ~per-element on
    TPU and used to dominate the whole filter chain). Only O(padlen x C)
    edge rows are gathered/scattered.
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
    p = padlen
    if T <= p:
        raise ValueError(f"input length {T} must exceed padlen {p}")
    nv = jnp.broadcast_to(jnp.asarray(n, jnp.int32), (C,))
    Text = T + 2 * p + 1  # +1 row so the state injection slot exists at n==T

    # odd extension: the left edge is static; the right edge is p rows at
    # dynamic positions [n+p, n+2p) per column. Dynamic-row gathers and
    # scatters are ~per-element on TPU, so the edge rows are built and
    # placed with broadcast-compare select/reduce passes instead (p extra
    # elementwise passes over the buffer — bandwidth-trivial).
    left = 2.0 * xf[0][None, :] - xf[1 : p + 1][::-1]
    ext = jnp.concatenate([left, xf, jnp.zeros((p + 1, C), jnp.float32)], axis=0)
    t_row = jnp.arange(T, dtype=jnp.int32)[:, None]  # (T, 1)
    xn1 = jnp.sum(jnp.where(t_row == nv[None, :] - 1, xf, 0.0), axis=0)  # (C,)
    t_idx = jnp.arange(Text, dtype=jnp.int32)[:, None]  # (Text, 1)
    for j in range(p):
        # ext[n+p+j] = 2*x[n-1] - x[n-2-j]
        src_j = jnp.sum(jnp.where(t_row == nv[None, :] - 2 - j, xf, 0.0), axis=0)
        ext = jnp.where(
            t_idx == nv[None, :] + p + j,
            (2.0 * xn1 - src_j)[None, :],
            ext,
        )
    valid = nv + 2 * p  # (C,) true extended length; rows beyond are junk

    zij = jnp.asarray(flt.zi_np, jnp.float32)
    z0 = zij[None, :] * ext[0][:, None]
    y = _lfilter_core(flt, ext, z0)  # causal: rows [0, valid) correct

    # backward pass: zero the junk tail, inject zi * y[valid-1] at row
    # ``valid`` (u there and beyond is zero, so w[valid] equals it exactly)
    yb = jnp.where(t_idx < valid[None, :], y, 0.0)
    ylast = jnp.sum(jnp.where(t_idx == valid[None, :] - 1, y, 0.0), axis=0)  # (C,)
    zb = zij[None, :] * ylast[:, None]  # (C, m) DF2T state
    w_inj_r = jnp.sum(zb[:, None, :] * flt.Vinv_r[None, :, :], axis=2)
    w_inj_i = jnp.sum(zb[:, None, :] * flt.Vinv_i[None, :, :], axis=2)
    y2 = _lfilter_core(
        flt, yb, jnp.zeros((C, flt.m), jnp.float32), reverse=True,
        inject_pos=valid, inject_wr=w_inj_r, inject_wi=w_inj_i,
    )

    out = y2[p : p + T]
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
