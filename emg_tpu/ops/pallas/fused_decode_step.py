"""Fused decoder token-step kernels (the beam/greedy hot loop).

The reference re-runs the whole prefix through the decoder every
autoregressive step (BeamSearch.py:104-170, greedy_search.py:21); this
repo's incremental `decode_step` already cuts that to one-token compute
over cached K/V, but XLA compiles it to ~460 micro-fusions per step
(profiled r2/r3) and the step is op-DISPATCH bound while its HBM traffic
bounds it far lower. Here each decoder layer's step runs as THREE Pallas
kernels instead:

  K1 self-block:  fused q|k projection + transposed v projection ->
                  cached self-attention with the current token's K/V
                  spliced in-register (the cache row at `step` is stale;
                  see models/attention.py attend_step) -> head-merge
                  output projection accumulated across a grid over heads
                  -> residual + LayerNorm1
  K2 cross-block: q projection -> attention over the utterance's shared
                  projected memory K/V -> output projection (grid over
                  heads, accumulated) -> residual + LayerNorm2
  K3 ffn-block:   Dense(ff) -> ReLU -> Dense(d) -> residual + LayerNorm3

6 layers x 3 kernels + the stacked cache writes ≈ 25 device ops per beam
step. Numerics match the XLA path: logits and softmax accumulate float32,
LayerNorm math is float32 (eps 1e-5), streams stay bfloat16; masking
reproduces the reference's semantics (PAD keys/queries -> -1e8 softmax
ties, not-yet-generated keys structurally excluded).

Mosaic lowering rules shape the data layout: TPU Pallas only lowers
leading-dimension broadcasts (``x[None]``), plain 2D ``dot_general``s
(no batch dims), and reductions within each leading slice — the same
idiom set as the proven flash kernels. Batched one-token attention
(every beam row owns its own cache) therefore runs on transposed
layouts where the broadcast dim LEADS:

  K cache per head: (S, B, Dh)   logits[s,b] = sum_d q[None,b,d]*k[s,b,d]
  V cache per head: (Dh, S, B)   out[d,b]    = sum_s p[None,s,b]*v[d,s,b]

and the new V row is produced directly transposed, (Dh, B) = w_v^T x^T,
so no in-kernel transposes exist. The FusedDecoder owns these cache
layouts (`init_cache`, `select_rows`); the XLA `decode_step` keeps its
(L, B, H, S, Dh) layout.

Weights are pre-arranged once per search (`prepare_fused_params`) into
per-head-slicable stacks so the kernels' BlockSpecs can walk heads
without any per-step layout ops.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_FILL = -1e8  # reference masked_fill value
STRUCT = -1e30  # structural exclusion (exp -> exactly 0 in f32)

# same platform gate as the flash kernels (tpu or the tunnel's "axon")
from emg_tpu.ops.pallas.flash_attention import flash_available  # noqa: E402,F401


class QuantTensor(NamedTuple):
    """An int8 weight + its per-output-channel scale, in kernel layout.
    Dequantized IN-KERNEL with the exact Int8Tensor.__jax_array__ formula
    (utils/quantize.py) so HBM->VMEM moves int8 while the MXU sees the
    stream dtype — combining the fused step with --decode.quantize_int8."""

    data: jnp.ndarray  # int8, same layout as the bf16 weight it replaces
    scale: jnp.ndarray  # f32, broadcastable (keepdims over contraction)


class FusedLayerParams(NamedTuple):
    w_qk: jnp.ndarray  # (H, D, 2Dh) bf16 [q|k] per head — or QuantTensor
    w_v: jnp.ndarray  # (H, D, Dh) bf16 (applied transposed in-kernel)
    w_o: jnp.ndarray  # (H, Dh, D) bf16
    ln1: jnp.ndarray  # (2, D) f32 [scale; bias]
    w_qc: jnp.ndarray  # (H, D, Dh) bf16 cross-attention query
    w_oc: jnp.ndarray  # (H, Dh, D) bf16
    ln2: jnp.ndarray  # (2, D) f32
    w1: jnp.ndarray  # (D, FF) bf16
    b1: jnp.ndarray  # (1, FF) f32
    w2: jnp.ndarray  # (FF, D) bf16
    b2: jnp.ndarray  # (1, D) f32
    ln3: jnp.ndarray  # (2, D) f32


def _is_quant(w) -> bool:
    return isinstance(w, QuantTensor)


def prepare_fused_params(variables, num_layers: int,
                         dtype=jnp.bfloat16) -> list:
    """Stack each decoder layer's weights into kernel-ready layouts.

    Weights already quantized by utils/quantize.quantize_decoder_int8
    (Int8Tensor leaves) keep their int8 data + scales as QuantTensors;
    plain leaves are cast to ``dtype``."""
    from emg_tpu.utils.quantize import Int8Tensor

    params = variables["params"]["transformerDecoder"]

    def w3(leaf):  # (H, Din, Dout) attention weight
        if isinstance(leaf, Int8Tensor):
            return QuantTensor(leaf.data, jnp.asarray(leaf.scale, jnp.float32))
        return jnp.asarray(leaf).astype(dtype)

    def cat_qk(wq, wk):  # fuse q|k along the output dim, int8-aware
        if isinstance(wq, Int8Tensor):
            return QuantTensor(
                jnp.concatenate([wq.data, wk.data], axis=2),
                jnp.concatenate(
                    [jnp.asarray(wq.scale, jnp.float32),
                     jnp.asarray(wk.scale, jnp.float32)], axis=2,
                ),
            )
        return jnp.concatenate(
            [jnp.asarray(wq), jnp.asarray(wk)], axis=2
        ).astype(dtype)

    out = []
    for i in range(num_layers):
        lp = params[f"layer{i}"]
        sa, ca = lp["self_attn"], lp["multihead_attn"]

        def ln(mod):
            return jnp.stack(
                [jnp.asarray(mod["scale"], jnp.float32),
                 jnp.asarray(mod["bias"], jnp.float32)]
            )

        ff = lp["ff"]
        out.append(FusedLayerParams(
            w_qk=cat_qk(sa["w_q"], sa["w_k"]),
            w_v=w3(sa["w_v"]),
            w_o=w3(sa["w_o"]),
            ln1=ln(lp["norm1"]),
            w_qc=w3(ca["w_q"]),
            w_oc=w3(ca["w_o"]),
            ln2=ln(lp["norm2"]),
            w1=w3(ff["linear1"]["kernel"]),
            b1=jnp.asarray(ff["linear1"]["bias"], jnp.float32)[None, :],
            w2=w3(ff["linear2"]["kernel"]),
            b2=jnp.asarray(ff["linear2"]["bias"], jnp.float32)[None, :],
            ln3=ln(lp["norm3"]),
        ))
    return out


def _layer_norm(y, ln_ref, eps=1e-5):
    """f32 LayerNorm over the last dim; ln_ref rows = [scale, bias]."""
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mean) ** 2, axis=-1, keepdims=True)
    return ((y - mean) / jnp.sqrt(var + eps)) * ln_ref[0][None, :] + ln_ref[1][None, :]


def _deq(w_ref, s_ref, quant: bool, dt):
    """Read a weight block, dequantizing int8 in-kernel when quantized —
    the exact Int8Tensor.__jax_array__ formula (utils/quantize.py:58-61),
    so the fused and XLA int8 paths see bit-identical weights."""
    w = w_ref[...]
    if quant:
        return w.astype(dt) * s_ref[...].astype(dt)
    return w


def _wq_arrays(w, headed: bool):
    """(values-to-pass, specs, quant flag) for a maybe-quantized weight.
    ``headed``: per-head (H, Din, Dout) tensors walked by a grid over H
    (the head dim squeezed on the leading block dim); otherwise whole-array
    blocks for the gridless FFN kernel."""
    if _is_quant(w):
        d, s = w.data, w.scale
        if headed:
            specs = [
                pl.BlockSpec((None,) + d.shape[1:], lambda h: (h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None,) + s.shape[1:], lambda h: (h, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
        else:
            specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        return [d, s], specs, True
    dummy = jnp.zeros((1, 1), jnp.float32)
    if headed:
        specs = [
            pl.BlockSpec((None,) + w.shape[1:], lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    return [w, dummy], specs, False


# ---------------------------------------------------------------------------
# K1: fused self-attention block (grid over heads, accumulate w_o output)
# ---------------------------------------------------------------------------

def _self_block_kernel(step_ref, x_ref, wqk_ref, sqk_ref, wv_ref, sv_ref,
                       wo_ref, so_ref, ln1_ref,
                       k_ref, v_ref, kpad_ref, qpad_ref,
                       x1_ref, knew_ref, vnewT_ref, acc_ref,
                       *, H, Dh, scale, q_qk, q_v, q_o):
    h = pl.program_id(0)
    x = x_ref[...]  # (B, D) bf16
    B = x.shape[0]
    S = k_ref.shape[0]  # k block (S, B, Dh)
    step = step_ref[0, 0]
    dt = x.dtype

    qk = jax.lax.dot_general(
        x, _deq(wqk_ref, sqk_ref, q_qk, dt),  # (D, 2Dh) — head dim squeezed
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (B, 2Dh) f32
    q = qk[:, :Dh]
    k_new = qk[:, Dh:]
    # the new V row comes out directly transposed, (Dh, B) = w_v^T x^T, so
    # the splice below and the (Dh, S, B) cache write need no transposes
    v_newT = jax.lax.dot_general(
        _deq(wv_ref, sv_ref, q_v, dt), x, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Dh, B) f32
    knew_ref[...] = k_new.astype(knew_ref.dtype)
    vnewT_ref[...] = v_newT.astype(vnewT_ref.dtype)

    ks = k_ref[...]  # (S, B, Dh) bf16 (this head's cache)
    # round q / k_new to the stream dtype first: the XLA attend_step
    # projects at the compute dtype, so its logits see rounded operands.
    # The contraction runs as a leading-broadcast multiply + f32 reduce on
    # the VPU (upcast-then-multiply is exact for bf16 operands, identical
    # to the MXU's bf16xbf16->f32 accumulate)
    q_r = q.astype(ks.dtype)
    logits = jnp.sum(
        q_r[None].astype(jnp.float32) * ks.astype(jnp.float32), axis=-1
    ) * scale  # (S, B) f32
    cur = jnp.sum(
        q_r.astype(jnp.float32) * k_new.astype(ks.dtype).astype(jnp.float32),
        axis=-1,
    )[None, :] * scale  # (1, B) f32
    pos = jax.lax.broadcasted_iota(jnp.int32, (S, B), 0)
    at_step = pos == step
    logits = jnp.where(at_step, cur, logits)
    # reference masking: PAD keys / PAD query -> -1e8; future keys excluded
    logits = jnp.where(kpad_ref[...] != 0, NEG_FILL, logits)
    logits = jnp.where(qpad_ref[...] != 0, NEG_FILL, logits)
    logits = jnp.where(pos <= step, logits, STRUCT)

    m = jnp.max(logits, axis=0, keepdims=True)  # (1, B)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=0, keepdims=True)
    p = p / denom  # (S, B) f32
    # round where the XLA attend_step materializes the stream dtype so the
    # two paths' logits agree to rounding noise: probs->bf16 before the PV
    # contraction, the PV output itself, and the current-token splice.
    # The at_step cache row is all-zeros (never written), so including it
    # in the PV sum matches attend_step exactly.
    p_r = p.astype(ks.dtype)
    o = jnp.sum(
        p_r[None].astype(jnp.float32) * v_ref[...].astype(jnp.float32),
        axis=1,
    )  # (Dh, B) f32
    p_step = jnp.sum(
        jnp.where(at_step, p, 0.0), axis=0, keepdims=True
    ).astype(ks.dtype)  # (1, B)
    o = o.astype(ks.dtype) + p_step * v_newT.astype(ks.dtype)  # (Dh, B)

    wo = _deq(wo_ref, so_ref, q_o, dt)
    contrib = jax.lax.dot_general(
        o.astype(wo.dtype), wo,  # (Dh, D), contract dim 0
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (B, D) f32

    @pl.when(h == 0)
    def _init():
        acc_ref[...] = contrib

    @pl.when(h > 0)
    def _acc():
        acc_ref[...] += contrib

    @pl.when(h == H - 1)
    def _finish():
        # XLA's head-merge einsum rounds the summed heads to the stream
        # dtype before the bf16 residual add; LN then promotes to f32
        sa = acc_ref[...].astype(x.dtype)
        y = (x + sa).astype(jnp.float32)
        x1_ref[...] = _layer_norm(y, ln1_ref[...]).astype(x1_ref.dtype)


def self_block(step, x, w_qk, w_v, w_o, ln1, k_cache, v_cache, kpadT, qpad,
               *, interpret=False):
    """x (B,D) bf16; k_cache (H,S,B,Dh); v_cache (H,Dh,S,B);
    kpadT (S,B) int32; qpad (1,B) int32. Weights may be QuantTensors.
    Returns x1 (B,D), k_new (H,B,Dh), v_newT (H,Dh,B)."""
    B, D = x.shape
    H, S, Dh = k_cache.shape[0], k_cache.shape[1], k_cache.shape[3]
    scale = 1.0 / (Dh ** 0.5)
    vqk, sqk, q_qk = _wq_arrays(w_qk, headed=True)
    vv, sv, q_v = _wq_arrays(w_v, headed=True)
    vo, so, q_o = _wq_arrays(w_o, headed=True)
    kern = functools.partial(_self_block_kernel, H=H, Dh=Dh, scale=scale,
                             q_qk=q_qk, q_v=q_v, q_o=q_o)
    x1, k_new, v_newT = pl.pallas_call(
        kern,
        grid=(H,),
        in_specs=[
            # step lives in SMEM as (1, 1): a 1-D (1,) operand would gain a
            # vmap dim -> (lanes, 1) whose size-1 batch block fails Mosaic's
            # last-two-dims whole/tiled check; with 2-D the vmap dim is a
            # squeezed leading dim and the last two dims stay whole.
            pl.BlockSpec(memory_space=pltpu.SMEM),  # step (1, 1)
            pl.BlockSpec((B, D), lambda h: (0, 0), memory_space=pltpu.VMEM),
            *sqk, *sv, *so,
            pl.BlockSpec((2, D), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, B, Dh), lambda h: (h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Dh, S, B), lambda h: (h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        # every per-head output squeezes its head dim on the LEADING array
        # dim (Mosaic requires each block's trailing dims be whole/tiled)
        out_specs=[
            pl.BlockSpec((B, D), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, B, Dh), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Dh, B), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), x.dtype),
            jax.ShapeDtypeStruct((H, B, Dh), k_cache.dtype),
            jax.ShapeDtypeStruct((H, Dh, B), v_cache.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(step, jnp.int32).reshape(1, 1), x, *vqk, *vv, *vo, ln1,
      k_cache, v_cache, kpadT, qpad)
    return x1, k_new, v_newT


# ---------------------------------------------------------------------------
# K2: fused cross-attention block (shared memory K/V, grid over heads)
# ---------------------------------------------------------------------------

def _cross_block_kernel(x1_ref, wqc_ref, sqc_ref, woc_ref, soc_ref, ln2_ref,
                        ck_ref, cv_ref, mpad_ref,
                        x2_ref, acc_ref, *, H, Dh, scale, q_qc, q_oc):
    h = pl.program_id(0)
    x1 = x1_ref[...]  # (B, D)
    dt = x1.dtype
    q = jax.lax.dot_general(
        x1, _deq(wqc_ref, sqc_ref, q_qc, dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, Dh)
    ck = ck_ref[...]  # (T, Dh) bf16
    logits = jax.lax.dot_general(
        q.astype(ck.dtype), ck, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (B, T)
    logits = jnp.where(mpad_ref[...] != 0, NEG_FILL, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(cv_ref.dtype), cv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, Dh)
    woc = _deq(woc_ref, soc_ref, q_oc, dt)
    contrib = jax.lax.dot_general(
        o.astype(woc.dtype), woc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(h == 0)
    def _init():
        acc_ref[...] = contrib

    @pl.when(h > 0)
    def _acc():
        acc_ref[...] += contrib

    @pl.when(h == H - 1)
    def _finish():
        ca = acc_ref[...].astype(x1.dtype)
        y = (x1 + ca).astype(jnp.float32)
        x2_ref[...] = _layer_norm(y, ln2_ref[...]).astype(x2_ref.dtype)


def cross_block(x1, w_qc, w_oc, ln2, cross_k, cross_v, mpad,
                *, interpret=False):
    """x1 (B,D); cross_k/v (1,H,T,Dh) — ONE utterance's memory shared
    across all rows (the beam layout; see decode_step's _cross_shared);
    mpad (1,T) int32. Weights may be QuantTensors."""
    B, D = x1.shape
    N, H, T, Dh = cross_k.shape
    assert N == 1, f"fused cross_block shares one memory; got N={N}"
    scale = 1.0 / (Dh ** 0.5)
    vqc, sqc, q_qc = _wq_arrays(w_qc, headed=True)
    voc, soc, q_oc = _wq_arrays(w_oc, headed=True)
    kern = functools.partial(_cross_block_kernel, H=H, Dh=Dh, scale=scale,
                             q_qc=q_qc, q_oc=q_oc)
    return pl.pallas_call(
        kern,
        grid=(H,),
        in_specs=[
            pl.BlockSpec((B, D), lambda h: (0, 0), memory_space=pltpu.VMEM),
            *sqc, *soc,
            pl.BlockSpec((2, D), lambda h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, Dh), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, Dh), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, D), lambda h: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), x1.dtype),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        interpret=interpret,
    )(x1, *vqc, *voc, ln2, cross_k[0], cross_v[0], mpad)


# ---------------------------------------------------------------------------
# K2b: per-row cross-attention block (batched utterances — the greedy path)
# ---------------------------------------------------------------------------

def _cross_block_rows_kernel(x1_ref, wqc_ref, sqc_ref, woc_ref, soc_ref,
                             ln2_ref, ck_ref, cv_ref, mpadT_ref,
                             x2_ref, acc_ref, m_ref, d_ref, o_ref,
                             *, H, Dh, scale, q_qc, q_oc):
    """Each row attends its OWN memory: ck (TC, B, Dh), cv (Dh, TC, B),
    mpadT (TC, B) — the same transposed layouts as the self block, minus
    the current-token splice (memory K/V are complete).

    The memory axis T is walked in grid chunks with an ONLINE softmax
    (running max / denom / weighted-V in f32 scratch): a whole-T block of
    the (Dh, T, B) cache pads B to the 128-lane tile, so at T=512 a single
    block costs Dh*T*128*2B = 12.6 MB — double-buffered that exceeds the
    16 MB scoped-VMEM limit *in launch contexts where XLA stacks other
    live VMEM buffers* (a standalone compile-probe passed while the same
    shapes OOMed inside the greedy lax.while_loop). Chunking bounds the
    working set regardless of T and context."""
    h = pl.program_id(0)
    t = pl.program_id(1)
    NT = pl.num_programs(1)
    x1 = x1_ref[...]  # (B, D)
    dt = x1.dtype
    B = x1.shape[0]

    @pl.when(t == 0)
    def _reset():
        m_ref[...] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        d_ref[...] = jnp.zeros(d_ref.shape, jnp.float32)
        o_ref[...] = jnp.zeros(o_ref.shape, jnp.float32)

    q = jax.lax.dot_general(
        x1, _deq(wqc_ref, sqc_ref, q_qc, dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, Dh)
    ck = ck_ref[...]  # (TC, B, Dh)
    q_r = q.astype(ck.dtype)
    logits = jnp.sum(
        q_r[None].astype(jnp.float32) * ck.astype(jnp.float32), axis=-1
    ) * scale  # (TC, B)
    logits = jnp.where(mpadT_ref[...] != 0, NEG_FILL, logits)
    m_old = m_ref[...]  # (1, B)
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=0, keepdims=True))
    corr = jnp.exp(m_old - m_new)  # (1, B)
    p = jnp.exp(logits - m_new)  # (TC, B) f32, unnormalized
    m_ref[...] = m_new
    d_ref[...] = d_ref[...] * corr + jnp.sum(p, axis=0, keepdims=True)
    o_ref[...] = o_ref[...] * corr + jnp.sum(
        p[None] * cv_ref[...].astype(jnp.float32), axis=1
    )  # (Dh, B)

    @pl.when(t == NT - 1)
    def _head_done():
        o = (o_ref[...] / d_ref[...]).astype(ck.dtype)  # (Dh, B)
        woc = _deq(woc_ref, soc_ref, q_oc, dt)
        contrib = jax.lax.dot_general(
            o.astype(woc.dtype), woc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, D)

        @pl.when(h == 0)
        def _init():
            acc_ref[...] = contrib

        @pl.when(h > 0)
        def _acc():
            acc_ref[...] += contrib

        @pl.when(h == H - 1)
        def _finish():
            ca = acc_ref[...].astype(x1.dtype)
            y = (x1 + ca).astype(jnp.float32)
            x2_ref[...] = _layer_norm(y, ln2_ref[...]).astype(x2_ref.dtype)


def _chunk_t(T: int) -> int:
    """Largest power-of-two chunk <= 128 dividing T (T itself if prime-ish:
    serve-time T comes from FRAME_BUCKETS and is a multiple of 8)."""
    for tc in (128, 64, 32, 16, 8):
        if T % tc == 0:
            return tc
    return T


def cross_block_rows(x1, w_qc, w_oc, ln2, ck_t, cv_t, mpadT,
                     *, interpret=False):
    """x1 (B,D); ck_t (H,T,B,Dh); cv_t (H,Dh,T,B); mpadT (T,B) int32.
    Weights may be QuantTensors."""
    B, D = x1.shape
    H, T, _, Dh = ck_t.shape
    TC = _chunk_t(T)
    scale = 1.0 / (Dh ** 0.5)
    vqc, sqc, q_qc = _wq_arrays(w_qc, headed=True)
    voc, soc, q_oc = _wq_arrays(w_oc, headed=True)
    kern = functools.partial(_cross_block_rows_kernel, H=H, Dh=Dh,
                             scale=scale, q_qc=q_qc, q_oc=q_oc)

    def _w(spec):  # lift a head-indexed weight spec to the (h, t) grid
        if spec.block_shape is None:
            return pl.BlockSpec(memory_space=spec.memory_space)
        bs, im = spec.block_shape, spec.index_map
        return pl.BlockSpec(bs, lambda h, t, _im=im: _im(h),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(H, T // TC),
        in_specs=[
            pl.BlockSpec((B, D), lambda h, t: (0, 0),
                         memory_space=pltpu.VMEM),
            *[_w(s) for s in sqc], *[_w(s) for s in soc],
            pl.BlockSpec((2, D), lambda h, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TC, B, Dh), lambda h, t: (h, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Dh, TC, B), lambda h, t: (h, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, B), lambda h, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, D), lambda h, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), x1.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
            pltpu.VMEM((1, B), jnp.float32),
            pltpu.VMEM((Dh, B), jnp.float32),
        ],
        interpret=interpret,
    )(x1, *vqc, *voc, ln2, ck_t, cv_t, mpadT)


# ---------------------------------------------------------------------------
# K3: fused FFN block
# ---------------------------------------------------------------------------

def _ffn_kernel(x2_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                ln3_ref, x3_ref, acc_ref, *, q_w1, q_w2, NC):
    # flax Dense(dtype=stream) rounds each matmul to the stream dtype and
    # adds the bias there (transformer.py FeedForward); mirror that so the
    # fused and XLA steps agree to rounding noise at bf16. The FF dim is
    # walked in NC grid chunks (VMEM fit + DMA/compute overlap); ReLU and
    # the h rounding are elementwise over FF, so chunking is exact, and
    # the second matmul accumulates float32 across chunks like one dot.
    c = pl.program_id(0)
    x2 = x2_ref[...]
    dt = x2.dtype
    h = jax.lax.dot_general(
        x2, _deq(w1_ref, s1_ref, q_w1, dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b1_ref[...].astype(dt)
    h = jnp.maximum(h, 0.0)
    w2 = _deq(w2_ref, s2_ref, q_w2, dt)
    contrib = jax.lax.dot_general(
        h.astype(w2.dtype), w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, D) f32

    @pl.when(c == 0)
    def _init():
        acc_ref[...] = contrib

    @pl.when(c > 0)
    def _acc():
        acc_ref[...] += contrib

    @pl.when(c == NC - 1)
    def _finish():
        y = acc_ref[...].astype(dt) + b2_ref[...].astype(dt)
        y = (x2 + y).astype(jnp.float32)
        x3_ref[...] = _layer_norm(y, ln3_ref[...]).astype(x3_ref.dtype)


def ffn_block(x2, w1, b1, w2, b2, ln3, *, interpret=False, ff_block=1024):
    B, D = x2.shape
    FF = (w1.data if _is_quant(w1) else w1).shape[1]
    blk = FF if FF <= ff_block or FF % ff_block else ff_block
    NC = FF // blk
    quant1, quant2 = _is_quant(w1), _is_quant(w2)
    v1 = [w1.data, w1.scale] if quant1 else [w1, jnp.zeros((1, 1), jnp.float32)]
    v2 = [w2.data, w2.scale] if quant2 else [w2, jnp.zeros((1, 1), jnp.float32)]
    s1_spec = (pl.BlockSpec((1, blk), lambda c: (0, c),
                            memory_space=pltpu.VMEM) if quant1 else
               pl.BlockSpec((1, 1), lambda c: (0, 0),
                            memory_space=pltpu.VMEM))
    s2_spec = (pl.BlockSpec((1, D), lambda c: (0, 0),
                            memory_space=pltpu.VMEM) if quant2 else
               pl.BlockSpec((1, 1), lambda c: (0, 0),
                            memory_space=pltpu.VMEM))
    kern = functools.partial(_ffn_kernel, q_w1=quant1, q_w2=quant2, NC=NC)
    return pl.pallas_call(
        kern,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((B, D), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, blk), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            s1_spec,
            pl.BlockSpec((1, blk), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, D), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            s2_spec,
            pl.BlockSpec((1, D), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, D), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        interpret=interpret,
    )(x2, *v1, b1, *v2, b2, ln3)


# ---------------------------------------------------------------------------
# Whole-step driver
# ---------------------------------------------------------------------------

class FusedDecoder:
    """decode_step-equivalent driver over the fused kernels.

    Mirrors EMGModel.decode_step (models/model.py:199-227) outside flax:
    embedding lookup with the PAD row pinned to zero, the 1/d-scaled
    sinusoidal PE (both decoder_pe modes), the fused per-layer kernels,
    the stacked cache writes, and the float32 w_out head. Parity with the
    XLA step is pinned by tests/test_fused_decode.py.

    Owns its transposed cache layouts (module docstring): callers create
    caches with `init_cache` and re-order beam rows with `select_rows`.
    """

    def __init__(self, model_cfg, variables, interpret: bool = False):
        from emg_tpu.models.positional import sinusoid_table
        from emg_tpu.text.phonemes import PAD_ID

        self.cfg = model_cfg
        self.pad_id = PAD_ID
        self.interpret = interpret  # default for step/step_rows (CPU tests)
        L = model_cfg.num_layers_decoder
        D = model_cfg.model_size
        dt = (jnp.bfloat16 if model_cfg.compute_dtype == "bfloat16"
              else jnp.float32)
        self.dtype = dt
        self.layers = prepare_fused_params(variables, L, dtype=dt)
        table = jnp.asarray(
            variables["params"]["embedding_tgt"]["embedding"], jnp.float32
        )
        self.embed = table.at[PAD_ID].set(0.0)
        self.pe = jnp.asarray(sinusoid_table(5000, D), jnp.float32)
        self.w_out_k = jnp.asarray(
            variables["params"]["w_out"]["kernel"], jnp.float32
        )
        self.w_out_b = jnp.asarray(
            variables["params"]["w_out"]["bias"], jnp.float32
        )

    # -- cache management (fused layouts) -----------------------------------
    def init_cache(self, batch_size: int, max_len: int):
        """Zeroed K/V caches in the kernels' layouts:
        k (L, H, S, B, Dh), v (L, H, Dh, S, B)."""
        L = self.cfg.num_layers_decoder
        H = self.cfg.n_heads_decoder
        Dh = self.cfg.model_size // H
        return (
            jnp.zeros((L, H, max_len, batch_size, Dh), self.dtype),
            jnp.zeros((L, H, Dh, max_len, batch_size), self.dtype),
        )

    @staticmethod
    def select_rows(caches, sel):
        """Re-order the beam-row axis by `sel` (device_beam's cache_sel)."""
        k_all, v_all = caches
        return k_all[:, :, :, sel], v_all[..., sel]

    @staticmethod
    def prepare_cross_rows(cross_kvs):
        """Per-row memory K/V (the model's (B, H, T, Dh) project_cross_kvs
        output) re-laid into the kernels' transposed forms, ONCE per batch:
        per layer (ck_t (H, T, B, Dh), cv_t (H, Dh, T, B))."""
        return [
            (jnp.transpose(ck, (1, 2, 0, 3)), jnp.transpose(cv, (1, 3, 2, 0)))
            for ck, cv in cross_kvs
        ]

    def _embed_pe(self, token_ids, step):
        D = self.cfg.model_size
        x = self.embed[token_ids]  # (B, D) f32
        if self.cfg.decoder_pe == "reference_batch":
            x = x + (1.0 / D) * self.pe[: x.shape[0]]
        else:
            x = x + (1.0 / D) * jax.lax.dynamic_index_in_dim(
                self.pe, step, axis=0, keepdims=True
            )
        return x.astype(self.dtype)

    def _finish_step(self, out, k_news, v_newsT, caches, step):
        k_all, v_all = caches
        k_all = jax.lax.dynamic_update_slice(
            k_all, k_news[:, :, None].astype(k_all.dtype),
            (0, 0, step, 0, 0),
        )
        v_all = jax.lax.dynamic_update_slice(
            v_all, v_newsT[:, :, :, None].astype(v_all.dtype),
            (0, 0, 0, step, 0),
        )
        logits = (out.astype(jnp.float32) @ self.w_out_k + self.w_out_b)
        return logits, (k_all, v_all)

    def step(self, token_ids, step, caches, cross_kvs, tokens,
             memory_pad_mask, *, interpret=None):
        """Same contract as EMGModel.decode_step: (logits, caches).
        cross_kvs per layer (1, H, T, Dh) — shared beam memory."""
        x = self._embed_pe(token_ids, step)
        out, k_news, v_newsT = fused_decode_step(
            self.layers, x, caches, cross_kvs, step,
            tokens == self.pad_id, token_ids == self.pad_id,
            memory_pad_mask,
            interpret=self.interpret if interpret is None else interpret,
        )
        return self._finish_step(out, k_news, v_newsT, caches, step)

    def step_rows(self, token_ids, step, caches, cross_rows, tokens,
                  memory_pad_maskT, *, interpret=None):
        """Per-row-memory variant (batched greedy): cross_rows from
        `prepare_cross_rows`, memory_pad_maskT already transposed (T, B)
        (loop-invariant — transpose once outside the decode loop)."""
        x = self._embed_pe(token_ids, step)
        out, k_news, v_newsT = fused_decode_step_rows(
            self.layers, x, caches, cross_rows, step,
            tokens == self.pad_id, token_ids == self.pad_id,
            memory_pad_maskT,
            interpret=self.interpret if interpret is None else interpret,
        )
        return self._finish_step(out, k_news, v_newsT, caches, step)

    def probe(self, B: int, S: int, T: int = 64, *, rows: bool = False,
              vmapped: bool = False):
        """Compile one step at the caller's real shapes so a Mosaic
        lowering/VMEM rejection surfaces here (to be caught and fallen
        back from) instead of breaking the first decode launch."""
        H = self.cfg.n_heads_decoder
        Dh = self.cfg.model_size // H
        L = self.cfg.num_layers_decoder
        dt = self.dtype
        caches = self.init_cache(B, S)
        tok = jnp.zeros((B,), jnp.int32)
        tokens = jnp.zeros((B, S), jnp.int32)
        if rows:
            cross = [
                (jnp.zeros((H, T, B, Dh), dt), jnp.zeros((H, Dh, T, B), dt))
                for _ in range(L)
            ]
            mpad = jnp.zeros((T, B), bool)
            fn = self.step_rows
        else:
            cross = [
                (jnp.zeros((1, H, T, Dh), dt), jnp.zeros((1, H, T, Dh), dt))
                for _ in range(L)
            ]
            mpad = jnp.zeros((1, T), bool)
            fn = self.step
        # compile inside a minimal lax.while_loop: scoped-VMEM accounting
        # differs between a standalone step and a loop body where XLA
        # stacks other live VMEM buffers alongside the kernel (observed on
        # v5e: a standalone probe at (1, 33, 512) passed while the same
        # shapes OOMed inside the greedy while_loop). Probing in loop
        # context makes "probe passes" mean "launch will not OOM".
        def _loop(fn_, tok_, caches_, cross_, tokens_, mpad_):
            def body(c):
                i, tk, ca = c
                logits, ca = fn_(tk, i, ca, cross_, tokens_, mpad_)
                tk = jnp.argmax(logits, axis=-1).astype(tk.dtype)
                return i + 1, tk, ca

            _, _, ca = jax.lax.while_loop(
                lambda c: c[0] < 1, body, (jnp.int32(0), tok_, caches_))
            return ca

        jax.jit(functools.partial(_loop, fn)).lower(
            tok, caches, cross, tokens, mpad
        ).compile()
        if vmapped:
            two = lambda x: jnp.stack([x, x])

            def vfn(tk, i, ca, cross_, tokens_, mpad_):
                # lanes carry their own step counters in the continuous
                # server — vmap over step as well, broadcast from the
                # loop's scalar counter
                return jax.vmap(fn)(
                    tk, jnp.full((tk.shape[0],), i, jnp.int32), ca,
                    cross_, tokens_, mpad_)

            jax.jit(functools.partial(_loop, vfn)).lower(
                two(tok), jax.tree.map(two, caches), jax.tree.map(two, cross),
                two(tokens), two(mpad),
            ).compile()

    def parity_check(self, model, variables, B: int, S: int, T: int = 64,
                     *, rows: bool = False, vmapped: bool = False,
                     steps: int = 3, seed: int = 0):
        """EXECUTE the compiled fused step against the XLA decode_step on
        the live backend with shared random inputs, over ``steps`` token
        steps (so cached K/V reads are exercised), and require agreement.

        The compile probe only catches Mosaic *rejections*; a compiled
        kernel that lowers but computes wrong numbers would silently
        corrupt every beam/greedy result while fused_step defaults on.
        Agreement means: logits allclose within the stream dtype's
        rounding envelope, and identical greedy argmax wherever the XLA
        top-2 logit gap is decisive (near-ties may legitimately reorder
        under a different bf16 accumulation order). Raises
        FusedParityError on divergence."""
        import numpy as np

        H = self.cfg.n_heads_decoder
        Dh = self.cfg.model_size // H
        L = self.cfg.num_layers_decoder
        dt = self.dtype
        key = jax.random.PRNGKey(seed)
        kc, kt = jax.random.split(key)
        lead = B if rows else 1
        cross_kvs = [
            (0.3 * jax.random.normal(jax.random.fold_in(kc, 2 * i),
                                     (lead, H, T, Dh), dt),
             0.3 * jax.random.normal(jax.random.fold_in(kc, 2 * i + 1),
                                     (lead, H, T, Dh), dt))
            for i in range(L)
        ]
        # last quarter of the memory padded, like a bucketed utterance
        src_mask = jnp.zeros((lead, T), bool).at[:, T - T // 4:].set(True)
        tokens = jax.random.randint(kt, (B, S), 0, 40, jnp.int32)
        steps = min(steps, S - 1)

        caches_x = model.init_decode_cache(B, S)
        caches_f = self.init_cache(B, S)
        if rows:
            cross_f = self.prepare_cross_rows(cross_kvs)
            mpad_f = src_mask.T

            def fstep(tok, t, caches):
                return self.step_rows(tok, t, caches, cross_f, tokens, mpad_f)
        else:
            cross_f, mpad_f = cross_kvs, src_mask

            def fstep(tok, t, caches):
                return self.step(tok, t, caches, cross_f, tokens, mpad_f)

        if self.dtype == jnp.bfloat16:
            rtol, atol = 3e-2, 3e-2
        else:
            rtol, atol = 2e-5, 1e-4
        lg_f0 = None
        for t in range(steps):
            tok = tokens[:, t]
            lg_x, caches_x = model.apply(
                variables, tok, t, caches_x, cross_kvs, tokens, src_mask,
                method=model.decode_step,
            )
            lg_f, caches_f = fstep(tok, t, caches_f)
            lg_x = np.asarray(lg_x, np.float32)
            lg_fn = np.asarray(lg_f, np.float32)
            if t == 0:
                lg_f0 = lg_f
            if not np.allclose(lg_fn, lg_x, rtol=rtol, atol=atol):
                worst = float(np.max(np.abs(lg_fn - lg_x)))
                raise FusedParityError(
                    f"fused step logits diverge from XLA at step {t}: "
                    f"max |diff| {worst:.4g} (rtol {rtol}, atol {atol})"
                )
            srt = np.sort(lg_x, axis=-1)
            gap = srt[:, -1] - srt[:, -2]
            decisive = gap > 2.0 * (atol + rtol * np.abs(srt[:, -1]))
            agree = lg_fn.argmax(-1) == lg_x.argmax(-1)
            if not np.all(agree | ~decisive):
                raise FusedParityError(
                    f"fused step argmax diverges from XLA at step {t} on a "
                    f"decisively-scored row (top-2 gap {gap.min():.4g})"
                )
        if vmapped and lg_f0 is not None:
            # vmapped lanes (search_many / continuous server) must match
            # the unbatched kernel: the grid gains a lane dim in Mosaic,
            # which could miscompile independently of the base form. Every
            # operand is stacked (the real lanes each own their buffers).
            two = lambda x: jnp.stack([x, x])
            vfn = self.step_rows if rows else self.step
            lgv, _ = jax.vmap(vfn)(
                two(tokens[:, 0]), jnp.zeros((2,), jnp.int32),
                jax.tree.map(two, self.init_cache(B, S)),
                jax.tree.map(two, cross_f), two(tokens), two(mpad_f),
            )
            lgv = np.asarray(lgv, np.float32)
            base = np.asarray(lg_f0, np.float32)
            for lane in range(2):
                if not np.allclose(lgv[lane], base, rtol=rtol, atol=atol):
                    raise FusedParityError(
                        f"vmapped fused step lane {lane} diverges from the "
                        "unbatched fused step"
                    )


class FusedParityError(AssertionError):
    """Compiled fused kernels disagree numerically with the XLA step."""


def maybe_fused_decoder(model_cfg, variables, B: int, S: int, T: int = 64,
                        *, rows: bool = False, vmapped: bool = False,
                        model=None, extra_shapes=()):
    """A FusedDecoder if the platform supports it AND its kernels compile
    at these shapes; None otherwise (callers keep the XLA decode_step).

    ``model``: when given, the probe also EXECUTES the compiled kernels
    against the XLA decode_step on the live backend and falls back on any
    numeric divergence (see parity_check) — compile acceptance alone does
    not prove Mosaic computed the same numbers.
    ``extra_shapes``: additional (B, S, T) triples to compile-probe, for
    callers that will launch the step at several bucketed geometries (the
    CLI greedy path); a rejection at ANY shape falls back, keeping the
    documented all-or-nothing fallback behavior."""
    if not flash_available():
        return None
    fd = FusedDecoder(model_cfg, variables)
    try:
        fd.probe(B, S, T, rows=rows, vmapped=vmapped)
        for (b2, s2, t2) in extra_shapes:
            fd.probe(b2, s2, t2, rows=rows, vmapped=vmapped)
    except Exception as e:  # Mosaic lowering/VMEM rejection
        import warnings

        warnings.warn(
            "fused decode-step kernels failed to compile on this backend "
            f"({type(e).__name__}); using the XLA decode_step instead"
        )
        return None
    if model is not None:
        try:
            fd.parity_check(model, variables, B, S, T,
                            rows=rows, vmapped=vmapped)
        except FusedParityError as e:
            import warnings

            warnings.warn(
                "fused decode-step kernels compiled but DISAGREE with the "
                f"XLA step on this backend ({e}); using the XLA decode_step "
                "instead"
            )
            return None
    return fd


def fused_decode_step(layer_params, x, caches, cross_kvs, step,
                      tokens_pad_mask, query_is_pad, memory_pad_mask,
                      *, interpret=False):
    """One token step through all decoder layers via the fused kernels.

    x: (B, D) embedded+PE'd token at the compute dtype.
    caches: (k_all (L,H,S,B,Dh), v_all (L,H,Dh,S,B)) — read-only here; the
    new rows are returned for the caller's stacked writes (same contract
    as TransformerDecoder.decode_step).
    cross_kvs: per-layer (cross_k, cross_v), each (1, H, T, Dh) — one
    utterance's memory shared across the beam rows.
    Returns (out (B, D), k_news (L, H, B, Dh), v_newsT (L, H, Dh, B)).
    """
    k_all, v_all = caches
    B = x.shape[0]
    S = k_all.shape[2]
    # masks in the kernels' (S, B) layout
    kpadT = tokens_pad_mask.astype(jnp.int32).T  # (S, B)
    qpad = query_is_pad.astype(jnp.int32).reshape(1, B)
    mpad = memory_pad_mask.astype(jnp.int32)  # (1, T)

    k_news, v_newsT = [], []
    for i, lp in enumerate(layer_params):
        x1, k_new, v_newT = self_block(
            step, x, lp.w_qk, lp.w_v, lp.w_o, lp.ln1, k_all[i], v_all[i],
            kpadT, qpad, interpret=interpret,
        )
        k_news.append(k_new)
        v_newsT.append(v_newT)
        ck, cv = cross_kvs[i]
        x2 = cross_block(
            x1, lp.w_qc, lp.w_oc, lp.ln2, ck, cv, mpad,
            interpret=interpret,
        )
        x = ffn_block(x2, lp.w1, lp.b1, lp.w2, lp.b2, lp.ln3,
                      interpret=interpret)
    return x, jnp.stack(k_news), jnp.stack(v_newsT)


def fused_decode_step_rows(layer_params, x, caches, cross_rows, step,
                           tokens_pad_mask, query_is_pad, memory_pad_maskT,
                           *, interpret=False):
    """fused_decode_step with PER-ROW memory (batched greedy): cross_rows
    per layer (ck_t (H,T,B,Dh), cv_t (H,Dh,T,B)) from prepare_cross_rows;
    memory_pad_maskT (T, B)."""
    k_all, v_all = caches
    B = x.shape[0]
    kpadT = tokens_pad_mask.astype(jnp.int32).T  # (S, B)
    qpad = query_is_pad.astype(jnp.int32).reshape(1, B)
    mpadT = memory_pad_maskT.astype(jnp.int32)  # (T, B)

    k_news, v_newsT = [], []
    for i, lp in enumerate(layer_params):
        x1, k_new, v_newT = self_block(
            step, x, lp.w_qk, lp.w_v, lp.w_o, lp.ln1, k_all[i], v_all[i],
            kpadT, qpad, interpret=interpret,
        )
        k_news.append(k_new)
        v_newsT.append(v_newT)
        ck_t, cv_t = cross_rows[i]
        x2 = cross_block_rows(
            x1, lp.w_qc, lp.w_oc, lp.ln2, ck_t, cv_t, mpadT,
            interpret=interpret,
        )
        x = ffn_block(x2, lp.w1, lp.b1, lp.w2, lp.b2, lp.ln3,
                      interpret=interpret)
    return x, jnp.stack(k_news), jnp.stack(v_newsT)
