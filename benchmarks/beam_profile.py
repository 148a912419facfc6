"""Isolate the device-beam p50's cost components on the attached chip.

Components measured:
  - dispatch_ms: p50 of a trivial jitted program (fixed launch latency)
  - search_p50_ms: the bench's beam search, synchronous per call
  - search_amortized_ms: per-search time of PIPE back-to-back async
    dispatches (device time + non-overlappable overhead)
  - steps_marginal_ms: marginal device cost of one beam step, from the
    difference between max_len=LONG and max_len=SHORT searches (the scan
    is static-trip; alive-gating makes extra steps cheap but nonzero)

Run: python benchmarks/beam_profile.py
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

import bench  # noqa: E402


def p50(fn, n=11, sync=True):
    times = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        if sync:
            jax.block_until_ready(out)
        times.append(time.time() - t0)
    return float(np.median(times) * 1000.0)


def main():
    cfg_m = bench.ModelConfig(
        compute_dtype=bench.DecodeConfig().compute_dtype)
    model = bench.EMGModel(cfg_m)
    run_once, utts, geo, model, variables, stages = bench.build_greedy_pipeline()

    # dispatch floor
    trivial = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(trivial(x))
    dispatch_ms = p50(lambda: trivial(x))

    # the bench beam
    from emg_tpu.decode import ArpaLanguageModel, init_tree
    from emg_tpu.decode.device_beam import DeviceBeamSearcher
    from emg_tpu.decode.device_lm import build_device_lm
    from emg_tpu.decode.lm_train import train_arpa, write_arpa
    import tempfile

    tree = init_tree(
        os.path.join(bench.FIXTURES, "phonesSet"),
        os.path.join(bench.FIXTURES, "vocabulary"),
        os.path.join(bench.FIXTURES, "lexicon.txt"),
    )
    compiled = tree.compile_tables()
    sents = ["the cat sat", "the dog ran", "the cat ran home", "a dog sat",
             "we go now", "the moon is cold"] * 2
    with tempfile.TemporaryDirectory() as td:
        arpa = os.path.join(td, "lm.arpa")
        write_arpa(train_arpa(sents, order=3), arpa)
        lm = ArpaLanguageModel(arpa)
    lex_words = [
        compiled.dictionary.lookup_word_by_index(i).name
        for i in range(compiled.dictionary.word_count())
    ]
    dlm = build_device_lm(lm, lex_words)

    utt = bench.synth_utterances(seed=3)[2]
    raw_bufs = np.zeros((1, bench.DSP_BUCKET, 8), np.float32)
    raw_bufs[0, : utt.shape[0]] = utt
    probe = bench.preprocess_emg_batched(
        jnp.asarray(raw_bufs), np.asarray([utt.shape[0]], np.int32),
        np.zeros(1, np.int32), np.zeros(1, np.int32), ())
    F = int(probe.n_frames[0])
    raw = 50.0 * np.tanh(np.asarray(probe.emg_orig)[0, 8 : 8 + 8 * F] / 20.0 / 50.0)
    n_rows = (8 * F + 1599) // 1600
    rows_b = 8 * ((n_rows + 7) // 8)
    flat = np.full((rows_b * 1600, 8), 42.0, np.float32)
    flat[: 8 * F] = raw
    target_len = 20
    S = 33
    batch = bench.PackedBatch(
        packed_raw=flat.reshape(-1, 1600, 8), n_rows=np.int32(n_rows),
        lengths=np.asarray([F], np.int32), offsets=np.zeros(1, np.int32),
        targets=np.full((1, S), 42, np.int64),
        target_lengths=np.asarray([S], np.int32), n_examples=np.int32(1),
    )

    dcfg = bench.DecodeConfig(BeamWidth=100)
    searcher = DeviceBeamSearcher(
        model, variables, compiled, dlm, dcfg, bench.MAX_FRAMES,
        max_steps=S - 1)
    searcher.search(batch, target_len)  # compile+warm
    search_p50 = p50(lambda: searcher.search(batch, target_len))

    # amortized: issue the raw jitted search N times without fetching
    fn = searcher._search_fn
    ml = jnp.int32(target_len + dcfg.extra_steps)
    jax.block_until_ready(fn(searcher.variables, batch, ml))
    N = 10
    t0 = time.time()
    outs = [fn(searcher.variables, batch, ml) for _ in range(N)]
    jax.block_until_ready(outs[-1])
    amortized = (time.time() - t0) / N * 1000.0

    # marginal per-step device cost: a second searcher with more steps
    searcher_long = DeviceBeamSearcher(
        model, variables, compiled, dlm, dcfg, bench.MAX_FRAMES,
        max_steps=2 * (S - 1))
    fnl = searcher_long._search_fn or searcher_long._build()
    searcher_long._search_fn = fnl
    jax.block_until_ready(fnl(searcher_long.variables, batch, ml))
    t0 = time.time()
    outs = [fnl(searcher_long.variables, batch, ml) for _ in range(N)]
    jax.block_until_ready(outs[-1])
    amortized_long = (time.time() - t0) / N * 1000.0

    per_step = (amortized_long - amortized) / (S - 1)
    print({
        "dispatch_ms": round(dispatch_ms, 2),
        "search_p50_ms": round(search_p50, 2),
        "search_amortized_ms": round(amortized, 2),
        "search_amortized_2x_steps_ms": round(amortized_long, 2),
        "marginal_step_ms": round(per_step, 3),
        "n_steps": S - 1,
    })


if __name__ == "__main__":
    main()
