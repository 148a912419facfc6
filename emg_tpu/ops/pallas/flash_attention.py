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

Query-padding fills are omitted on purpose. The reference (and the repo's
XLA path) REPLACES pad-query rows' logits with -1e8, so pad-query outputs
(and their local gradients) differ between the two paths; this is safe
because pad-position encoder outputs are discarded downstream — the
per-utterance gather (models/model.py:_gather_utterances) zeroes padded
positions and the losses mask them — and therefore receive exactly zero
cotangent on the backward pass.

Both serving and training use these kernels when the gate in
models/attention.py engages (T % 256 == 0 and T >= 512 on TPU); training
runs the differentiable twin (custom_vjp backward kernels below) with
in-kernel hash-RNG dropout.
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
        # p @ v runs at the IO dtype (bf16 inputs -> full MXU rate); the
        # accumulator stays float32 via preferred_element_type
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
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

    # bf16 inputs keep their dtype into the MXU dots (full matmul rate);
    # everything else accumulates in float32 exactly as before
    cdt = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    pad_r = (-(T - 1)) % 128
    Wpad = _round_up(2 * T - 1 + pad_r, 128)
    used_p = jnp.pad(
        used.astype(cdt), ((0, 0), (0, Wpad - (2 * T - 1)), (0, 0))
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
        q.astype(cdt), k.astype(cdt), v.astype(cdt),
        used_p, oob_p, kp,
    )
    return out


# ---------------------------------------------------------------------------
# Training path: fwd (+ logsumexp, in-kernel dropout) and FlashAttention-2
# style backward kernels, all with the same in-kernel rel->abs skew.
# ---------------------------------------------------------------------------
#
# Dropout uses a counter-based hash RNG (murmur3 finalizer over the GLOBAL
# (b, h, query, key) element index), not pltpu.prng_*: the mask is then a
# pure function of (seed, b, h, qg, kg) — bitwise identical in the forward
# kernel, both backward kernels, and interpret mode — independent of block
# shapes and loop order, with no state to thread across grid steps.

_KEEP_BITS = 30  # compare in [0, 2^30): keep-prob resolution 2^-30


def _roll_rows(R, shift_sign, bq, pad_r):
    """Roll row ii of R by shift_sign * (ii + pad_r) lanes (cyclic).

    shift_sign=+1 is the fwd skew (bias becomes one aligned slice per key
    block); -1 is its exact inverse (used by backward to map accumulated
    bias gradients back to true relative indices). pltpu.roll is cyclic and
    wants non-negative shifts, so negative ones wrap modulo the width."""
    W = R.shape[1]
    R = pltpu.roll(R, (shift_sign * pad_r) % W, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, R.shape, 0)
    b = 1
    while b < bq:
        R = jnp.where((row & b) != 0, pltpu.roll(R, (shift_sign * b) % W, 1), R)
        b *= 2
    return R


def _keep_mask(seed, b, h, i, kb, bq, bk, rate):
    """(bq, bk) float32 dropout keep mask for the tile whose global query
    rows start at i*bq and key columns at kb*bk. murmur3-finalizer hash of
    the global element coordinates; int32 wraparound arithmetic matches
    uint32 semantics bit-for-bit."""
    qg = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    kg = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    x = (
        seed
        + b * jnp.int32(-1640531527)   # 0x9E3779B9 (golden-ratio odd)
        + h * jnp.int32(-862048943)    # 0xCC9E2D51
        + qg * jnp.int32(461845907)    # 0x1B873593
        + kg * jnp.int32(-1028477387)  # 0xC2B2AE35
    )
    for mul in (jnp.int32(-2048144789), jnp.int32(-1028477387)):
        x = x ^ jax.lax.shift_right_logical(x, 16)
        x = x * mul
    x = x ^ jax.lax.shift_right_logical(x, 16)
    r = x & jnp.int32((1 << _KEEP_BITS) - 1)
    thresh = jnp.int32(int(round((1.0 - rate) * (1 << _KEEP_BITS))))
    return (r < thresh).astype(jnp.float32)


def _fwd_train_kernel(seed_ref, q_ref, k_ref, v_ref, used_ref, oob_ref,
                      kp_ref, o_ref, lse_ref, r_scratch,
                      *, bq, bk, scale, pad_r, rate):
    """Forward with saved logsumexp and post-softmax dropout.

    o = sum_j keep_j * p_j * v_j / (l * keep_prob) — dropout applies to the
    normalized probabilities (reference transformer.py MHA drops probs), so
    the normalizer l stays the UNdropped sum and lse = m + log l is exactly
    the deterministic softmax statistic the backward pass needs."""
    T = k_ref.shape[0]
    Dh = q_ref.shape[1]
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    i = pl.program_id(2)
    q = q_ref[:]

    R = jax.lax.dot_general(
        q, used_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    R = R + oob_ref[0, :][None, :]
    r_scratch[:] = _roll_rows(R, 1, bq, pad_r)

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
        if rate > 0.0:
            p = p * _keep_mask(seed_ref[0], b_idx, h_idx, i, kb, bq, bk, rate)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, T // bk, body, (m0, l0, acc0))
    keep_prob = 1.0 - rate
    o_ref[:] = acc / (l * keep_prob)
    lse_ref[:] = m + jnp.log(l)


def _bwd_dq_kernel(seed_ref, q_ref, k_ref, v_ref, used_ref, oob_ref, kp_ref,
                   do_ref, lse_ref, delta_ref, dq_ref, dused_ref, r_scratch,
                   dr_scratch, *, bq, bk, scale, pad_r, rate):
    """Grid: (H, B, T//bq) — h OUTERMOST so the d_used output block (one per
    head) is revisited consecutively and accumulates in VMEM across (b, i).

    ds = p * (keep * (do @ v^T) / keep_prob - delta); dq = ds @ k * scale
    plus the bias term dR @ used; d_used += dR^T @ q, with dR the accumulated
    ds mapped back through the inverse skew."""
    T = k_ref.shape[0]
    Dh = q_ref.shape[1]
    h_idx = pl.program_id(0)
    b_idx = pl.program_id(1)
    i = pl.program_id(2)
    q = q_ref[:]
    do = do_ref[:]
    lse = lse_ref[:]
    delta = delta_ref[:]
    keep_prob = 1.0 - rate

    R = jax.lax.dot_general(
        q, used_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    R = R + oob_ref[0, :][None, :]
    r_scratch[:] = _roll_rows(R, 1, bq, pad_r)
    dr_scratch[:] = jnp.zeros_like(dr_scratch)

    dq0 = jnp.zeros((bq, Dh), jnp.float32)

    def body(kb, dq_acc):
        ks = k_ref[pl.ds(kb * bk, bk), :]
        vs = v_ref[pl.ds(kb * bk, bk), :]
        s = jax.lax.dot_general(
            q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        coff = pl.multiple_of(kb * bk - i * bq + (T - 1) + pad_r, 128)
        s = s + r_scratch[:, pl.ds(coff, bk)]
        s = s + kp_ref[0, pl.ds(kb * bk, bk)][None, :]
        p = jnp.exp(s - lse)

        dp = jax.lax.dot_general(
            do, vs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            dp = dp * (
                _keep_mask(seed_ref[0], b_idx, h_idx, i, kb, bq, bk, rate)
                / keep_prob
            )
        ds = p * (dp - delta)
        dq_acc = dq_acc + jax.lax.dot_general(
            ds.astype(ks.dtype), ks, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dr_scratch[:, pl.ds(coff, bk)] += ds
        return dq_acc

    dq_acc = jax.lax.fori_loop(0, T // bk, body, dq0)
    dR = _roll_rows(dr_scratch[:], -1, bq, pad_r)
    dRc = dR.astype(q.dtype)
    dq_acc = dq_acc + jax.lax.dot_general(
        dRc, used_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[:] = dq_acc

    du = jax.lax.dot_general(
        dRc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Wpad, Dh)
    first = (b_idx == 0) & (i == 0)

    @pl.when(first)
    def _():
        dused_ref[:] = du

    @pl.when(~first)
    def _():
        dused_ref[:] += du


def _bwd_dkv_kernel(seed_ref, k_ref, v_ref, q_ref, used_ref, oob_ref, kp_ref,
                    do_ref, lse_ref, delta_ref, dk_ref, dv_ref, r_scratch,
                    *, bq, bk, scale, pad_r, rate):
    """Grid: (B, H, T//bk). For each key/value block, iterate query blocks,
    recompute p from the saved lse, and accumulate
    dv += (keep * p / keep_prob)^T @ do and dk += ds^T @ q * scale."""
    T = q_ref.shape[0]
    Dh = k_ref.shape[1]
    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    kb = pl.program_id(2)
    ks = k_ref[:]
    vs = v_ref[:]
    kp_col = kp_ref[0, pl.ds(kb * bk, bk)][None, :]
    keep_prob = 1.0 - rate

    dk0 = jnp.zeros((bk, Dh), jnp.float32)
    dv0 = jnp.zeros((bk, Dh), jnp.float32)

    def body(i, carry):
        dk_acc, dv_acc = carry
        qs = q_ref[pl.ds(i * bq, bq), :]
        dos = do_ref[pl.ds(i * bq, bq), :]
        lses = lse_ref[pl.ds(i * bq, bq), :]
        deltas = delta_ref[pl.ds(i * bq, bq), :]

        R = jax.lax.dot_general(
            qs, used_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        R = R + oob_ref[0, :][None, :]
        r_scratch[:] = _roll_rows(R, 1, bq, pad_r)

        s = jax.lax.dot_general(
            qs, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        coff = pl.multiple_of(kb * bk - i * bq + (T - 1) + pad_r, 128)
        s = s + r_scratch[:, pl.ds(coff, bk)]
        s = s + kp_col
        p = jnp.exp(s - lses)

        if rate > 0.0:
            keep = _keep_mask(seed_ref[0], b_idx, h_idx, i, kb, bq, bk, rate)
            pd = p * (keep / keep_prob)
        else:
            pd = p
        dv_acc = dv_acc + jax.lax.dot_general(
            pd.astype(dos.dtype), dos, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            dos, vs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            dp = dp * (keep / keep_prob)
        ds = p * (dp - deltas)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(qs.dtype), qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        return dk_acc, dv_acc

    dk_acc, dv_acc = jax.lax.fori_loop(0, T // bq, body, (dk0, dv0))
    dk_ref[:] = dk_acc
    dv_ref[:] = dv_acc


def _prep_inputs(used, oob, key_pad, T, cdt):
    pad_r = (-(T - 1)) % 128
    Wpad = _round_up(2 * T - 1 + pad_r, 128)
    used_p = jnp.pad(
        used.astype(cdt), ((0, 0), (0, Wpad - (2 * T - 1)), (0, 0))
    )
    oob_p = jnp.pad(
        oob.astype(jnp.float32), (0, Wpad - (2 * T - 1)), constant_values=NEG_FILL
    )[None, :]
    kp = jnp.where(key_pad, NEG_FILL, 0.0).astype(jnp.float32)[:, None, :]
    return used_p, oob_p, kp, pad_r, Wpad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _flash_train(rate, bq, bk, interpret, q, k, v, used_p, oob_p, kp, seed):
    o, _ = _flash_train_fwd(rate, bq, bk, interpret, q, k, v, used_p, oob_p,
                            kp, seed)
    return o


def _flash_train_fwd(rate, bq, bk, interpret, q, k, v, used_p, oob_p, kp, seed):
    B, H, T, Dh = q.shape
    Wpad = used_p.shape[1]
    pad_r = (-(T - 1)) % 128
    scale = 1.0 / (Dh ** 0.5)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    grid = (B, H, T // bq)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_train_kernel, bq=bq, bk=bk, scale=scale,
                          pad_r=pad_r, rate=rate),
        grid=grid,
        in_specs=[
            smem,
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
        out_specs=[
            pl.BlockSpec((None, None, bq, Dh), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, bq, 1), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bq, Wpad), jnp.float32)],
        interpret=interpret,
    )(seed_arr, q, k, v, used_p, oob_p, kp)
    return o, (q, k, v, used_p, oob_p, kp, seed_arr, o, lse)


def _flash_train_bwd(rate, bq, bk, interpret, res, g):
    q, k, v, used_p, oob_p, kp, seed_arr, o, lse = res
    B, H, T, Dh = q.shape
    Wpad = used_p.shape[1]
    pad_r = (-(T - 1)) % 128
    scale = 1.0 / (Dh ** 0.5)
    delta = jnp.sum(g.astype(jnp.float32) * o, axis=-1, keepdims=True)
    qf = q
    kf = k
    vf = v
    do = g.astype(q.dtype)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    dq, dused = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, bq=bq, bk=bk, scale=scale,
                          pad_r=pad_r, rate=rate),
        grid=(H, B, T // bq),
        in_specs=[
            smem,
            pl.BlockSpec((None, None, bq, Dh), lambda h, b, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, Dh), lambda h, b, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, Dh), lambda h, b, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Wpad, Dh), lambda h, b, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wpad), lambda h, b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, T), lambda h, b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, bq, Dh), lambda h, b, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, bq, 1), lambda h, b, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, bq, 1), lambda h, b, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, None, bq, Dh), lambda h, b, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Wpad, Dh), lambda h, b, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, Dh), jnp.float32),
            jax.ShapeDtypeStruct((H, Wpad, Dh), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, Wpad), jnp.float32),
            pltpu.VMEM((bq, Wpad), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr, qf, kf, vf, used_p, oob_p, kp, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, bq=bq, bk=bk, scale=scale,
                          pad_r=pad_r, rate=rate),
        grid=(B, H, T // bk),
        in_specs=[
            smem,
            pl.BlockSpec((None, None, bk, Dh), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, bk, Dh), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, Dh), lambda b, h, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Wpad, Dh), lambda b, h, j: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wpad), lambda b, h, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, T), lambda b, h, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, Dh), lambda b, h, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, 1), lambda b, h, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, T, 1), lambda b, h, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, None, bk, Dh), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, bk, Dh), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, Dh), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((bq, Wpad), jnp.float32)],
        interpret=interpret,
    )(seed_arr, kf, vf, qf, used_p, oob_p, kp, do, lse, delta)

    import numpy as np

    dseed = np.zeros((), jax.dtypes.float0)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        dused.astype(used_p.dtype),
        jnp.zeros_like(oob_p),
        jnp.zeros_like(kp),
        dseed,
    )


_flash_train.defvjp(_flash_train_fwd, _flash_train_bwd)


def flash_attention_relpos_train(
    q: jnp.ndarray,  # (B, H, T, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    used: jnp.ndarray,  # (H, 2T-1, Dh) embedding window (relpos.window())
    oob: jnp.ndarray,  # (2T-1,) additive 0/NEG_FILL out-of-range mask
    key_pad: jnp.ndarray,  # (B, T) bool, True = PAD key
    dropout_rate: float,
    seed,  # int32 scalar; dropout mask is a pure function of (seed, indices)
    bq: int = 256,
    bk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused encoder self-attention with learned relative
    positional bias and in-kernel post-softmax dropout — the training twin
    of ``flash_attention_relpos`` (reference semantics: transformer.py MHA
    with LearnedRelativePositionalEmbedding and p-dropout on the attention
    probabilities; the dropout STREAM differs from torch, as PARITY.md
    documents for every RNG).

    Gradients flow to q, k, v, and the embedding window ``used`` (the
    window is produced by differentiable XLA pad/slice ops, so the table's
    cotangent falls out of autodiff outside the kernel)."""
    B, H, T, Dh = q.shape
    assert T % bq == 0 and T % bk == 0, f"T={T} must tile by ({bq},{bk})"
    assert used.shape[:2] == (H, 2 * T - 1), used.shape
    cdt = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    used_p, oob_p, kp, pad_r, Wpad = _prep_inputs(used, oob, key_pad, T, cdt)
    o = _flash_train(float(dropout_rate), bq, bk, interpret,
                     q, k, v, used_p, oob_p, kp, seed)
    return o.astype(q.dtype)
