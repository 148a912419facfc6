"""int8 decode-weight benefit on silicon (VERDICT r4 item 7).

tests/test_quantize.py pins token parity at tiny scale on CPU; this script
measures what int8 storage actually BUYS on the TPU at flagship geometry:

  1. decoder-stack weight bytes resident in HBM (the per-step re-read
     traffic) with and without --decode.quantize_int8,
  2. device-beam p50 (BeamWidth 100, the bench workload) int8 vs bf16,
     fused Pallas step on both sides (int8 dequantizes IN-KERNEL) and,
     for reference, the XLA step int8 vs bf16,
  3. greedy decode (B=1) latency int8 vs bf16,
  4. output agreement between every pair.

If the delta is a wash at this model size (the decoder stack is ~50 MB in
bf16 — possibly small enough that the step is latency- not
bandwidth-bound), the honest outcome is "default off, measurement cited".

Run on a TPU-attached host: python benchmarks/int8_decode_check.py
"""

from __future__ import annotations

import dataclasses
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

from emg_tpu.config import DecodeConfig, ModelConfig  # noqa: E402
from emg_tpu.decode.device_beam import DeviceBeamSearcher  # noqa: E402
from emg_tpu.decode.greedy import greedy_decode_cached  # noqa: E402
from emg_tpu.models import EMGModel  # noqa: E402
from emg_tpu.ops.pallas.fused_decode_step import maybe_fused_decoder  # noqa: E402
from emg_tpu.utils.quantize import Int8Tensor, quantize_decoder_int8  # noqa: E402
from emg_tpu.utils.serving import cast_params_for_serving  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "benchmarks"))
from fused_beam_check import MAX_FRAMES, build_workload, p50  # noqa: E402


def decoder_bytes(variables):
    """HBM bytes of the decoder stack's step-resident weights."""
    dec = variables["params"]["transformerDecoder"]
    total = 0
    for leaf in jax.tree.leaves(dec, is_leaf=lambda x: isinstance(x, Int8Tensor)):
        if isinstance(leaf, Int8Tensor):
            total += leaf.data.size * leaf.data.dtype.itemsize
            total += leaf.scale.size * leaf.scale.dtype.itemsize
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total


def main():
    print("devices:", jax.devices())
    compiled, dlm, batch, S = build_workload()
    cfg_model = ModelConfig(compute_dtype=DecodeConfig().compute_dtype)
    model = EMGModel(cfg_model)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        jnp.asarray(batch.targets[:, :-1]), MAX_FRAMES, False,
    )
    target_len = 20

    served = cast_params_for_serving(variables)
    b_bf16 = decoder_bytes(served)
    b_int8 = decoder_bytes(quantize_decoder_int8(served))
    print(json.dumps({
        "decoder_step_weight_bytes": {
            "bf16": b_bf16, "int8": b_int8,
            "ratio": round(b_bf16 / b_int8, 3),
        }
    }))

    base = DecodeConfig(BeamWidth=100)
    variants = {
        "fused_bf16": dataclasses.replace(base, fused_step=True),
        "fused_int8": dataclasses.replace(base, fused_step=True,
                                          quantize_int8=True),
        "xla_bf16": dataclasses.replace(base, fused_step=False),
        "xla_int8": dataclasses.replace(base, fused_step=False,
                                        quantize_int8=True),
    }
    outs, row = {}, {}
    for name, cfg in variants.items():
        s = DeviceBeamSearcher(model, variables, compiled, dlm, cfg,
                               MAX_FRAMES, max_steps=S - 1)
        if cfg.fused_step:
            assert s._fused is not None, f"{name}: fused kernels fell back"
        outs[name] = s.search(batch, target_len)
        row[name + "_p50_ms"] = round(p50(s, batch, target_len), 2)
    print(json.dumps({"beam_p50_ms_W100": row}))
    ref_words = outs["fused_bf16"][2]
    for name, (h, sc, w) in outs.items():
        # int8 rounds every decoder weight; demand identical words
        assert w == ref_words, f"{name}: words diverged: {w} vs {ref_words}"
    print("beam agreement across variants: ok (words identical)")

    # greedy (B=1): fused per-row kernels, int8 vs bf16
    def t_greedy(vs, fd):
        out, _ = greedy_decode_cached(model, vs, batch, MAX_FRAMES, S - 1,
                                      fused=fd)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(5):
            out, _ = greedy_decode_cached(model, vs, batch, MAX_FRAMES,
                                          S - 1, fused=fd)
        jax.block_until_ready(out)
        return (time.time() - t0) / 5 * 1000.0

    vs_b = served
    vs_q = quantize_decoder_int8(served)
    g = {}
    mats = {}
    for name, vs in (("bf16", vs_b), ("int8", vs_q)):
        fd = maybe_fused_decoder(cfg_model, vs, 1, S, T=MAX_FRAMES, rows=True)
        assert fd is not None, f"greedy rows kernels fell back ({name})"
        mats[name], _ = greedy_decode_cached(model, vs, batch, MAX_FRAMES,
                                             S - 1, fused=fd)
        g[name + "_ms"] = round(t_greedy(vs, fd), 2)
    same = bool((np.asarray(mats["bf16"]) == np.asarray(mats["int8"])).all())
    print(json.dumps({"greedy_fused_ms_B1": g, "tokens_identical": same}))

    verdict = {
        "beam_delta_ms": round(row["fused_bf16_p50_ms"]
                               - row["fused_int8_p50_ms"], 2),
        "greedy_delta_ms": round(g["bf16_ms"] - g["int8_ms"], 2),
        "hbm_bytes_saved_per_step": b_bf16 - b_int8,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps({"int8_verdict": verdict}))


if __name__ == "__main__":
    main()
