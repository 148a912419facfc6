"""Flash attention with IN-KERNEL learned relative-positional bias.

Fuses the encoder self-attention — scores, learned relative-positional
logits (reference transformer.py:212-403), key-padding fills, online
softmax, and the value contraction — into one Pallas kernel. Nothing of
size (B, H, T, T) ever exists: the kernel receives the (H, ~2T, Dh)
embedding window, computes the per-query-block relative logits
``R = q_blk @ used^T`` on the MXU, and converts relative->absolute
indexing *inside the kernel*.

The skew trick (Mosaic cannot lower the XLA flat pad/reshape skew, and
per-row dynamic lane slices are unlowerable): the absolute-index bias for
query row ii / key column jj of a tile is ``R[ii, c + jj - ii]`` with
``c = key_offset - query_offset + T - 1`` — a per-row shift. Rolling row
ii right by ``ii + pad_r`` (log2(bq) static pltpu.roll + select passes,
plus one roll by the constant ``pad_r = (-(T-1)) % 128``) turns every
tile's bias into ONE shared contiguous slice at ``c + pad_r``, which is a
multiple of 128 by construction (ko, qo are multiples of the 128-aligned
block sizes and (T-1)+pad_r ≡ 0 mod 128) — exactly the alignment Mosaic's
lane slicing requires.

Query-padding fills are omitted on purpose: adding a constant to an entire
logit row (the reference's masked_fill of pad *queries*,
transformer.py:184-188) is a softmax no-op, so outputs are identical.

Used on deterministic (inference/serving) paths; training uses the XLA
formulation, which autodiff handles.
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

NEG_FILL = -1e8


def flash_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, used_ref, oob_ref, kp_ref, o_ref, r_scratch,
            *, bq, bk, scale, pad_r):
    """Grid: (B, H, T//bq). Blocks: q (bq, Dh), k/v (T, Dh),
    used (Wpad, Dh), oob (1, Wpad), kp (1, T), out (bq, Dh)."""
    T = k_ref.shape[0]
    Dh = q_ref.shape[1]
    i = pl.program_id(2)
    q = q_ref[:]

    # relative logits for this query block over the whole window, plus the
    # out-of-range additive mask (reference transformer.py:354-359)
    R = jax.lax.dot_general(
        q, used_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    R = R + oob_ref[0, :][None, :]
    # skew: roll row ii right by ii + pad_r so every key block's bias is a
    # single 128-aligned contiguous slice
    R = pltpu.roll(R, pad_r, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, R.shape, 0)
    b = 1
    while b < bq:
        R = jnp.where((row & b) != 0, pltpu.roll(R, b, 1), R)
        b *= 2
    r_scratch[:] = R

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, Dh), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        ks = k_ref[pl.ds(kb * bk, bk), :]
        vs = v_ref[pl.ds(kb * bk, bk), :]
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        coff = pl.multiple_of(kb * bk - i * bq + (T - 1) + pad_r, 128)
        s = s + r_scratch[:, pl.ds(coff, bk)]
        s = s + kp_ref[0, pl.ds(kb * bk, bk)][None, :]

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, vs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, T // bk, body, (m0, l0, acc0))
    o_ref[:] = acc / l


@functools.partial(jax.jit, static_argnames=("bq", "bk", "interpret"))
def flash_attention_relpos(
    q: jnp.ndarray,  # (B, H, T, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    used: jnp.ndarray,  # (H, 2T-1, Dh) embedding window (relpos.window())
    oob: jnp.ndarray,  # (2T-1,) additive 0/NEG_FILL out-of-range mask
    key_pad: jnp.ndarray,  # (B, T) bool, True = PAD key
    bq: int = 256,
    bk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, T, Dh = q.shape
    assert T % bq == 0 and T % bk == 0, f"T={T} must tile by ({bq},{bk})"
    assert used.shape[:2] == (H, 2 * T - 1), used.shape
    scale = 1.0 / (Dh ** 0.5)

    pad_r = (-(T - 1)) % 128
    Wpad = _round_up(2 * T - 1 + pad_r, 128)
    used_p = jnp.pad(
        used.astype(jnp.float32), ((0, 0), (0, Wpad - (2 * T - 1)), (0, 0))
    )
    oob_p = jnp.pad(
        oob.astype(jnp.float32), (0, Wpad - (2 * T - 1)), constant_values=NEG_FILL
    )[None, :]
    kp = jnp.where(key_pad, NEG_FILL, 0.0).astype(jnp.float32)[:, None, :]

    grid = (B, H, T // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, bq=bq, bk=bk, scale=scale, pad_r=pad_r),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, bq, Dh), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, Dh), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, Dh), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Wpad, Dh), lambda b, h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wpad), lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, T), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, None, bq, Dh), lambda b, h, i: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dh), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bq, Wpad), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * T * (2 * T * Dh + Wpad * Dh),
            bytes_accessed=4 * B * H * (4 * T * Dh) + 4 * H * Wpad * Dh,
            transcendentals=B * H * T * T,
        ),
    )(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        used_p, oob_p, kp,
    )
    return out
