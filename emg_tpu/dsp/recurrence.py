"""Parallel linear recurrences via associative scan.

The DSP front-end's IIR filters are first-order-in-state linear recurrences
    z[t] = A @ z[t-1] + u[t]
which are associative under affine-map composition, so they run in log-depth
on the TPU VPU via ``jax.lax.associative_scan`` instead of a sequential
``lax.scan`` over tens of thousands of samples. This replaces the role of
scipy.signal.lfilter/filtfilt in the reference's front-end
(reference read_emg.py:32-43) with a compiler-parallel formulation.

Two forms are provided:
- ``diagonal_recurrence``: the filter's companion matrix diagonalized on
  host; the scan is elementwise complex multiply-add. This is the form the
  filters use — companion matrices of narrowband IIR filters are badly
  conditioned under float32 matrix products, while diagonal powers decay
  monotonically and stay accurate (|eigenvalue| < 1).
- ``linear_recurrence``: general (m, m) matrix form, float precision pinned
  to HIGHEST so the TPU MXU does not drop to bf16 on the tiny matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def linear_recurrence(A: jnp.ndarray, u: jnp.ndarray, z_init: jnp.ndarray) -> jnp.ndarray:
    """Run z[t] = A @ z[t-1] + u[t] for t = 0..T-1 in parallel.

    Args:
      A: (m, m) constant transition matrix.
      u: (T, m) per-step inputs (already includes any input scaling).
      z_init: (m,) initial state z[-1].

    Returns:
      (T, m) array of states z[0..T-1].
    """
    T, m = u.shape

    def compose(left, right):
        A1, b1 = left
        A2, b2 = right
        return (
            jnp.einsum("...ij,...jk->...ik", A2, A1, precision=_HI),
            jnp.einsum("...ij,...j->...i", A2, b1, precision=_HI) + b2,
        )

    A_seq = jnp.broadcast_to(A, (T, m, m))
    cumA, cumB = jax.lax.associative_scan(compose, (A_seq, u))
    # z[t] = cumA[t] @ z_init + cumB[t]
    return jnp.einsum("tij,j->ti", cumA, z_init, precision=_HI) + cumB


def diagonal_recurrence(lam: jnp.ndarray, u: jnp.ndarray, w_init: jnp.ndarray) -> jnp.ndarray:
    """Run w[t] = lam * w[t-1] + u[t] (elementwise, complex) in parallel.

    Args:
      lam: (m,) complex eigenvalues, |lam| < 1.
      u: (T, m) complex per-step inputs.
      w_init: (m,) complex initial state w[-1].

    Returns:
      (T, m) complex states w[0..T-1].
    """
    T, m = u.shape

    def compose(left, right):
        p1, b1 = left
        p2, b2 = right
        return (p2 * p1, p2 * b1 + b2)

    P = jnp.broadcast_to(lam, (T, m))
    cumP, cumB = jax.lax.associative_scan(compose, (P, u))
    return cumP * w_init[None, :] + cumB


def diagonal_recurrence_tlast(lam: jnp.ndarray, u: jnp.ndarray, w_init: jnp.ndarray) -> jnp.ndarray:
    """Batched diagonal recurrence with time in the MINOR dimension.

    Scanning (T, C, m)-shaped arrays puts the tiny state size m in the TPU
    lane dimension, which Mosaic pads to 128 — a ~50x bandwidth tax. This
    variant scans along the last axis of (C, m, T) arrays so lanes carry
    time and sublanes carry (channel, state).

    Args:
      lam: (m,) complex eigenvalues.
      u: (C, m, T) complex per-step inputs.
      w_init: (C, m) complex initial states.

    Returns:
      (C, m, T) complex states.
    """
    C, m, T = u.shape
    ur, ui = jnp.real(u), jnp.imag(u)
    lr = jnp.broadcast_to(jnp.real(lam)[None, :, None], (C, m, T))
    li = jnp.broadcast_to(jnp.imag(lam)[None, :, None], (C, m, T))
    pr, pi, br, bi = _hillis_steele_affine_last(lr, li, ur, ui)
    wr0, wi0 = jnp.real(w_init)[:, :, None], jnp.imag(w_init)[:, :, None]
    wr = pr * wr0 - pi * wi0 + br
    wi = pr * wi0 + pi * wr0 + bi
    return jax.lax.complex(wr, wi)


def _hillis_steele_affine_last(pr, pi, br, bi, reverse: bool = False):
    """Inclusive scan of complex affine maps along the last axis, in split
    real/imaginary float32 arithmetic.

    Hand-written Hillis-Steele doubling (log2 T shift+combine passes) using
    only pads, static slices and real elementwise ops: lax.associative_scan
    over the minor axis lowers to strided lane slices the TPU backend
    rejects, and jit-fused complex arithmetic hits UNIMPLEMENTED Mosaic
    patterns — split-real shifted copies are native everywhere. Shifted-in
    elements use the identity map (P=1, B=0).

    With ``reverse=True`` the scan runs right-to-left (anti-causal:
    w[t] = lam * w[t+1] + u[t]), which lets zero-phase filtering's backward
    pass run on front-aligned buffers without any reversal gathers.
    """
    T = pr.shape[-1]
    pad = [(0, 0)] * (pr.ndim - 1)
    edge = (0, 1) if reverse else (1, 0)
    s = 1
    while s < T:
        # previous cumulative at t-s (t+s reversed); identity map shifts in
        pr_p = jnp.pad(pr, pad + [tuple(e * s for e in edge)], constant_values=1.0)
        pi_p = jnp.pad(pi, pad + [tuple(e * s for e in edge)], constant_values=0.0)
        br_p = jnp.pad(br, pad + [tuple(e * s for e in edge)], constant_values=0.0)
        bi_p = jnp.pad(bi, pad + [tuple(e * s for e in edge)], constant_values=0.0)
        sl = slice(s, None) if reverse else slice(None, T)
        pr_p, pi_p, br_p, bi_p = (
            pr_p[..., sl], pi_p[..., sl], br_p[..., sl], bi_p[..., sl],
        )
        # B = P * B_prev + B ; P = P * P_prev  (complex, expanded)
        br, bi = (
            pr * br_p - pi * bi_p + br,
            pr * bi_p + pi * br_p + bi,
        )
        pr, pi = (
            pr * pr_p - pi * pi_p,
            pr * pi_p + pi * pr_p,
        )
        s *= 2
    return pr, pi, br, bi
