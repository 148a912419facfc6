"""Flash attention with additive bias — Pallas TPU kernel.

Fuses the encoder self-attention's scores, additive bias (skewed relative
positional logits + padding masks), online softmax, and the value
contraction into one kernel, so the (B, H, T, T) score and probability
tensors never round-trip through HBM (the XLA path materializes both).
The relative-positional logits are computed and skewed outside the kernel
(Mosaic cannot lower the flat pad/reshape skew) and the -1e8 padding fills
are folded into the same bias operand: at e^-1e8 the masked weights are
identically zero in float32 either way, and fully-masked rows belong to
padded positions whose outputs are discarded downstream.

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


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, bq, bk, scale):
    """Grid: (BH, T//bq). Blocks: q (bq, Dh), k/v (T, Dh), bias (bq, T),
    out (bq, Dh)."""
    T = k_ref.shape[0]
    Dh = q_ref.shape[1]
    q = q_ref[:]

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
        s = s + bias_ref[:, pl.ds(kb * bk, bk)]

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
def flash_attention_bias(
    q: jnp.ndarray,  # (B, H, T, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (B, H, T, T) additive — rel-pos logits + mask fills
    bq: int = 256,
    bk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, T, Dh = q.shape
    assert T % bq == 0 and T % bk == 0, f"T={T} must tile by ({bq},{bk})"
    scale = 1.0 / (Dh ** 0.5)

    qf = q.reshape(B * H, T, Dh).astype(jnp.float32)
    kf = k.reshape(B * H, T, Dh).astype(jnp.float32)
    vf = v.reshape(B * H, T, Dh).astype(jnp.float32)
    bf = bias.reshape(B * H, T, T).astype(jnp.float32)

    grid = (B * H, T // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, bq=bq, bk=bk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, Dh), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, Dh), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, Dh), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bq, T), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, bq, Dh), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, T, Dh), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * T * T * (2 * Dh),
            bytes_accessed=4 * B * H * (3 * T * Dh + T * T),
            transcendentals=B * H * T * T,
        ),
    )(qf, kf, vf, bf)
    return out.reshape(B, H, T, Dh)


def masked_bias(rel_bias, key_pad, query_pad, H):
    """Fold -1e8 padding fills into the additive bias (B, H, T, T)."""
    kp = jnp.where(key_pad[:, None, None, :], NEG_FILL, 0.0)
    qp = jnp.where(query_pad[:, None, :, None], NEG_FILL, 0.0)
    return rel_bias + kp + qp
