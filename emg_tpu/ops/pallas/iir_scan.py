"""IIR diagonal-recurrence scan — Pallas TPU kernel.

Computes w[t] = lam * w[t-1] + u[t] (complex, split real/imag) for the DSP
front-end's eigenbasis filters — or, with ``reverse=True``, the anti-causal
mirror w[t] = lam * w[t+1] + u[t], which lets zero-phase filtering's
backward pass run on front-aligned buffers with no reversal gathers. The
XLA Hillis-Steele formulation materializes every doubling level in HBM
(~log2 T full-array passes); this kernel blocks time into VMEM-resident
chunks, runs the doubling scan on registers/VMEM, and carries the running
state across the sequential TPU grid in scratch — one HBM read of u and one
write of w total.

Layout: rows = C*m (channel-major state), lanes = time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def iir_scan_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _kernel(lamr_ref, lami_ref, w0r_ref, w0i_ref, ur_ref, ui_ref,
            wr_ref, wi_ref, carry_r, carry_i, *, bt, reverse):
    """Grid: (T//bt,). Blocks: lam/w0 (R, 1) full; u/w (R, bt) per step
    (right-to-left when reverse). carry_* are (R, 1) VMEM scratch persisting
    across grid steps."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        carry_r[:] = w0r_ref[:]
        carry_i[:] = w0i_ref[:]

    R = ur_ref.shape[0]
    pr = jnp.broadcast_to(lamr_ref[:], (R, bt)).astype(jnp.float32)
    pi = jnp.broadcast_to(lami_ref[:], (R, bt)).astype(jnp.float32)
    br = ur_ref[:]
    bi = ui_ref[:]

    # doubling combine: shift right (causal) or left (anti-causal)
    edge = (0, 1) if reverse else (1, 0)
    s = 1
    while s < bt:
        pads = ((0, 0), (edge[0] * s, edge[1] * s))
        sl = slice(s, None) if reverse else slice(None, bt)
        pr_p = jnp.pad(pr, pads, constant_values=1.0)[:, sl]
        pi_p = jnp.pad(pi, pads, constant_values=0.0)[:, sl]
        br_p = jnp.pad(br, pads, constant_values=0.0)[:, sl]
        bi_p = jnp.pad(bi, pads, constant_values=0.0)[:, sl]
        br, bi = pr * br_p - pi * bi_p + br, pr * bi_p + pi * br_p + bi
        pr, pi = pr * pr_p - pi * pi_p, pr * pi_p + pi * pr_p
        s *= 2

    cr = carry_r[:]
    ci = carry_i[:]
    wr = pr * cr - pi * ci + br
    wi = pr * ci + pi * cr + bi
    wr_ref[:] = wr
    wi_ref[:] = wi
    tap = slice(0, 1) if reverse else slice(bt - 1, bt)
    carry_r[:] = wr[:, tap]
    carry_i[:] = wi[:, tap]


def pick_block(R: int, T: int, bt: int = 512) -> int:
    """Largest power-of-two block that keeps the kernel's ~12 live (R, bt)
    float32 arrays plus double-buffered IO inside the 16 MB VMEM budget."""
    budget_floats = 3_200_000  # ~12.8 MB of f32, margin under the 16 MB cap
    while bt > 64 and 24 * R * bt > budget_floats:
        bt //= 2
    while T % bt:
        bt //= 2
    return max(bt, 1)


@functools.partial(jax.jit, static_argnames=("bt", "reverse", "interpret"))
def iir_scan(lam_r, lam_i, u_r, u_i, w0_r, w0_i, bt: int = 512,
             reverse: bool = False, interpret: bool = False):
    """Inputs: lam/w0 (R,), u (R, T). Returns (w_r, w_i) each (R, T).

    ``reverse=False``: w[t] = lam w[t-1] + u[t], w[-1] = w0.
    ``reverse=True``:  w[t] = lam w[t+1] + u[t], w[T] = w0 (blocks run
    right-to-left; the carry taps each block's leftmost state).
    """
    R, T = u_r.shape
    assert T % bt == 0, f"T={T} must be a multiple of block {bt}"
    lam_r = lam_r.reshape(R, 1)
    lam_i = lam_i.reshape(R, 1)
    w0_r = w0_r.reshape(R, 1)
    w0_i = w0_i.reshape(R, 1)

    nb = T // bt
    grid = (nb,)
    out_shape = [
        jax.ShapeDtypeStruct((R, T), jnp.float32),
        jax.ShapeDtypeStruct((R, T), jnp.float32),
    ]
    full = pl.BlockSpec((R, 1), lambda k: (0, 0), memory_space=pltpu.VMEM)
    if reverse:
        blocked = pl.BlockSpec(
            (R, bt), lambda k: (0, nb - 1 - k), memory_space=pltpu.VMEM
        )
    else:
        blocked = pl.BlockSpec((R, bt), lambda k: (0, k), memory_space=pltpu.VMEM)
    wr, wi = pl.pallas_call(
        functools.partial(_kernel, bt=bt, reverse=reverse),
        grid=grid,
        in_specs=[full, full, full, full, blocked, blocked],
        out_specs=[blocked, blocked],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lam_r, lam_i, w0_r, w0_i, u_r, u_i)
    return wr, wi
