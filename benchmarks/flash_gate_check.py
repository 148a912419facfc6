"""On-silicon flash-vs-XLA attention gate measurement (VERDICT r3 item 4).

The attention gate (models/attention.py FLASH_MIN_T) routes encoder
self-attention to the Pallas flash kernel when the PADDED length reaches
the threshold; below it the XLA path runs with its materialized rel->abs
skew reshapes. The >=256 default is measured at 256/384/512 but the
128/192 regime (the 1.4-2.1 s utterance buckets, read_emg.py:144) was
gated on an unmeasured claim. This script measures both paths at every
bucket the corpus uses, for serving (fwd) and training (fwd+bwd), at a
realistic batch size — the table goes into VALIDATION.md and sets
FLASH_MIN_T.

Run on a TPU-attached host: python benchmarks/flash_gate_check.py
"""

from __future__ import annotations

import json
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

from emg_tpu.models.attention import (  # noqa: E402
    LearnedRelativePositionalBias,
    MultiHeadAttention,
    relative_to_absolute,
)
from emg_tpu.ops.pallas.flash_attention import (  # noqa: E402
    flash_attention_relpos,
    flash_attention_relpos_train,
)

B, H, D, MAXPOS = 32, 8, 768, 100
Dh = D // H
NEG_FILL = -1e8


def xla_attention(q, k, v, used, oob, kpad):
    """The exact XLA formulation the gate falls back to."""
    logits = jnp.einsum("bhqa,bhka->bhqk", q, k) / (Dh ** 0.5)
    logits = jnp.where(kpad[:, None, None, :], NEG_FILL, logits)
    rel = jnp.einsum("bhld,hmd->bhlm", q, used.astype(q.dtype))
    T = q.shape[2]
    if T > MAXPOS:
        rel = rel + oob.astype(q.dtype)[None, None, None, :]
    logits = logits + relative_to_absolute(rel)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhka->bhqa", probs, v)


def window(table, L):
    pad = max(L - MAXPOS, 0)
    start = max(MAXPOS - L, 0)
    padded = jnp.pad(table, ((0, 0), (pad, pad), (0, 0)))
    used = jax.lax.dynamic_slice_in_dim(padded, start, 2 * L - 1, axis=1)
    m = jnp.arange(2 * L - 1)
    oob = jnp.where((m < pad) | (m >= 2 * L - 1 - pad), NEG_FILL, 0.0)
    return used, oob


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.normal(size=(H, 2 * MAXPOS - 1, Dh)) * 0.1, jnp.bfloat16
    )
    rows = []
    for T in (128, 192, 256, 384, 512):
        Tp = ((T + 127) // 128) * 128
        blk = 256 if Tp % 256 == 0 else (Tp if Tp <= 512 else 128)
        q = jnp.asarray(rng.normal(size=(B, H, T, Dh)) * 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, T, Dh)) * 0.3, jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.bfloat16)
        kpad = jnp.zeros((B, T), bool).at[:, T - T // 8:].set(True)
        used_t, oob_t = window(table, T)
        used_p, oob_p = window(table, Tp)

        def flash_fwd(q, k, v):
            if Tp != T:
                pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
                qq, kk, vv = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
                kp = jnp.pad(kpad, ((0, 0), (0, Tp - T)), constant_values=True)
            else:
                qq, kk, vv, kp = q, k, v, kpad
            return flash_attention_relpos(
                qq, kk, vv, used_p, oob_p, kp, bq=blk, bk=blk
            )[:, :, :T]

        def xla_fwd(q, k, v):
            return xla_attention(q, k, v, used_t, oob_t, kpad)

        def flash_train_loss(q, k, v):
            if Tp != T:
                pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
                qq, kk, vv = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
                kp = jnp.pad(kpad, ((0, 0), (0, Tp - T)), constant_values=True)
            else:
                qq, kk, vv, kp = q, k, v, kpad
            o = flash_attention_relpos_train(
                qq, kk, vv, used_p, oob_p, kp, 0.0, jnp.int32(0),
                bq=blk, bk=blk,
            )[:, :, :T]
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def xla_train_loss(q, k, v):
            o = xla_attention(q, k, v, used_t, oob_t, kpad)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        jf = jax.jit(flash_fwd)
        jx = jax.jit(xla_fwd)
        gf = jax.jit(jax.grad(flash_train_loss, argnums=(0, 1, 2)))
        gx = jax.jit(jax.grad(xla_train_loss, argnums=(0, 1, 2)))

        row = {
            "T": T, "Tp": Tp, "blk": blk,
            "serve_flash_ms": round(timeit(jf, q, k, v), 3),
            "serve_xla_ms": round(timeit(jx, q, k, v), 3),
            "train_flash_ms": round(timeit(gf, q, k, v), 3),
            "train_xla_ms": round(timeit(gx, q, k, v), 3),
        }
        row["serve_winner"] = (
            "flash" if row["serve_flash_ms"] < row["serve_xla_ms"] else "xla"
        )
        row["train_winner"] = (
            "flash" if row["train_flash_ms"] < row["train_xla_ms"] else "xla"
        )
        rows.append(row)
        print(json.dumps(row))

    # threshold recommendation: smallest Tp from which flash wins training
    # (training dominates total step time; serving has its own buckets)
    wins = [r["Tp"] for r in rows if r["train_winner"] == "flash"]
    rec = min(wins) if wins else 10 ** 9
    print(json.dumps({"recommended_FLASH_MIN_T": rec,
                      "device": jax.devices()[0].device_kind}))


if __name__ == "__main__":
    main()
