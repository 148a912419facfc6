"""Per-block timing of the fused decode-step kernels vs the XLA step.

The r5 beam split probe (benchmarks/beam_step_split.py) puts the decoder
pass at ~0.83 ms/step of the 0.96 ms/step beam slope — ~7x the ~0.12 ms
HBM floor of its ~100 MB bf16 weight stream. The r3/r4 fused kernels
measured SLOWER than XLA end to end; this probe breaks the loss down by
block so the next kernel iteration targets the real offender:

  - XLA decode_step, whole, per step      (fori_loop-amortized on device)
  - fused step, whole, per step
  - self_block / cross_block / ffn_block  (single layer, per call)
  - each at the native beam width W=100 and the tile-aligned W=128

Run: python benchmarks/fused_block_bench.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from emg_tpu.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emg_tpu.config import ModelConfig  # noqa: E402
from emg_tpu.models import EMGModel  # noqa: E402
from emg_tpu.ops.pallas.fused_decode_step import (  # noqa: E402
    FusedDecoder,
    cross_block,
    ffn_block,
    self_block,
)

S = 33  # max decode length (target 20 + extra steps + margin, bench regime)
T = 384  # serve-bucket encoder frames
N_STEPS = 32


def timed_loop(fn, *args, n=N_STEPS, reps=5):
    """Per-iteration ms of fn folded through a device fori_loop."""

    @jax.jit
    def run(args):
        def body(i, a):
            return fn(i, a)

        return jax.lax.fori_loop(0, n, body, args)

    out = jax.block_until_ready(run(args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(run(args))
        best = min(best, (time.time() - t0) / n * 1000.0)
    return best, out


def bench_width(B: int):
    cfg = ModelConfig(compute_dtype="bfloat16")
    model = EMGModel(cfg)
    H = cfg.n_heads_decoder
    D = cfg.model_size
    Dh = D // H
    L = cfg.num_layers_decoder
    rng = jax.random.PRNGKey(0)

    variables = model.init(
        {"params": rng},
        jnp.zeros((8, 1600, 8), jnp.float32), jnp.int32(8),
        jnp.zeros((1,), jnp.int32), jnp.full((1,), T, jnp.int32),
        jnp.full((1, S), 42, jnp.int64), T, False,
    )
    fused = FusedDecoder(cfg, variables, interpret=False)

    # shared-memory cross K/V, one utterance repeated over the beam
    memory = jax.random.normal(rng, (1, T, D), jnp.bfloat16)
    cross_kvs = model.apply(variables, memory, method=model.project_cross_kvs)
    src_mask = jnp.zeros((1, T), bool)
    tokens = jnp.full((B, S), 41, jnp.int32)
    tok0 = jnp.full((B,), 41, jnp.int32)

    out = {}

    # --- XLA decode_step ---------------------------------------------------
    caches_x = model.init_decode_cache(B, S)

    def xla_step(i, carry):
        tk, ca = carry
        logits, ca = model.apply(
            variables, tk, i, ca, cross_kvs, tokens, src_mask,
            method=model.decode_step,
        )
        return jnp.argmax(logits, -1).astype(tk.dtype), ca

    ms, _ = timed_loop(xla_step, tok0, caches_x)
    out["xla_step_ms"] = ms

    # --- fused step ----------------------------------------------------------
    caches_f = fused.init_cache(B, S)

    def fused_step(i, carry):
        tk, ca = carry
        logits, ca = fused.step(tk, i, ca, cross_kvs, tokens, src_mask)
        return jnp.argmax(logits, -1).astype(tk.dtype), ca

    try:
        ms, _ = timed_loop(fused_step, tok0, caches_f)
        out["fused_step_ms"] = ms
    except Exception as e:  # Mosaic rejection at this width
        out["fused_step_ms"] = f"FAILED: {type(e).__name__}"

    # --- individual blocks (single layer) ------------------------------------
    lp = fused.layers[0]
    x = jax.random.normal(rng, (B, D), jnp.bfloat16)
    k_cache = jnp.zeros((H, S, B, Dh), jnp.bfloat16)
    v_cache = jnp.zeros((H, Dh, S, B), jnp.bfloat16)
    kpadT = jnp.zeros((S, B), jnp.int32)
    qpad = jnp.zeros((1, B), jnp.int32)

    def self_only(i, x_):
        x1, _, _ = self_block(
            i, x_, lp.w_qk, lp.w_v, lp.w_o, lp.ln1, k_cache, v_cache,
            kpadT, qpad,
        )
        return x1

    ms, _ = timed_loop(self_only, x)
    out["self_block_ms"] = ms

    ck, cv = cross_kvs[0]  # (1, H, T, Dh)
    mpad = jnp.zeros((1, T), jnp.int32)

    def cross_only(i, x_):
        del i
        return cross_block(x_, lp.w_qc, lp.w_oc, lp.ln2, ck, cv, mpad)

    try:
        ms, _ = timed_loop(cross_only, x)
        out["cross_block_ms"] = ms
    except Exception as e:
        out["cross_block_ms"] = f"FAILED: {type(e).__name__}"

    def ffn_only(i, x_):
        del i
        return ffn_block(x_, lp.w1, lp.b1, lp.w2, lp.b2, lp.ln3)

    ms, _ = timed_loop(ffn_only, x)
    out["ffn_block_ms"] = ms

    # --- XLA equivalents of each block (rough: dense matmuls only) ----------
    wqk = lp.w_qk  # (H, D, 2Dh)
    wv, wo = lp.w_v, lp.w_o
    w1, w2 = lp.w1, lp.w2

    def xla_attn_mm(i, x_):
        qk = jnp.einsum("bd,hde->bhe", x_, wqk)
        v = jnp.einsum("bd,hde->bhe", x_, wv)
        o = jnp.einsum("bhe,hed->bd", v, wo)
        return (x_ + o.astype(x_.dtype) + qk[:, 0, :1]).astype(x_.dtype)

    ms, _ = timed_loop(xla_attn_mm, x)
    out["xla_self_matmuls_ms"] = ms

    def xla_ffn(i, x_):
        h = jnp.maximum(x_ @ w1, 0)
        return (x_ + (h @ w2).astype(x_.dtype)).astype(x_.dtype)

    ms, _ = timed_loop(xla_ffn, x)
    out["xla_ffn_matmuls_ms"] = ms

    return out


def main():
    for B in (100, 128):
        res = bench_width(B)
        print({"B": B, **{k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in res.items()}}, flush=True)


if __name__ == "__main__":
    main()
