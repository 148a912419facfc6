"""Real-TPU validation of the fused decode-step beam path.

tests/ force CPU (conftest), and the fused Pallas kernels only engage on
TPU (flash_available), so their on-silicon behavior is validated here:
builds the bench's beam workload (bench.py measure_beam_p50 geometry),
runs the SAME search with --decode.fused_step on and off, and

  1. asserts the fused searcher actually kept its kernels (the compile
     probe did not fall back to the XLA step),
  2. asserts both paths return the same winning hypothesis/words and
     near-equal scores,
  3. reports p50 latency for both paths.

Run on a TPU-attached host: python benchmarks/fused_beam_check.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from emg_tpu.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from emg_tpu.config import DecodeConfig, ModelConfig  # noqa: E402
from emg_tpu.data.batching import PackedBatch  # noqa: E402
from emg_tpu.decode import ArpaLanguageModel, init_tree  # noqa: E402
from emg_tpu.decode.device_beam import DeviceBeamSearcher  # noqa: E402
from emg_tpu.decode.device_lm import build_device_lm  # noqa: E402
from emg_tpu.decode.lm_train import train_arpa, write_arpa  # noqa: E402
from emg_tpu.dsp.pipeline import preprocess_emg_batched  # noqa: E402
from emg_tpu.models import EMGModel  # noqa: E402

FIXTURES = os.path.join(REPO, "tests", "fixtures")
MAX_FRAMES = 512
DSP_BUCKET = 4096


def build_workload():
    """The bench's single-utterance beam workload (bench.py:279-336)."""
    from bench import synth_utterances

    tree = init_tree(
        os.path.join(FIXTURES, "phonesSet"),
        os.path.join(FIXTURES, "vocabulary"),
        os.path.join(FIXTURES, "lexicon.txt"),
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

    utt = synth_utterances(seed=3)[2]
    raw_bufs = np.zeros((1, DSP_BUCKET, 8), np.float32)
    raw_bufs[0, : utt.shape[0]] = utt
    probe = preprocess_emg_batched(
        jnp.asarray(raw_bufs), np.asarray([utt.shape[0]], np.int32),
        np.zeros(1, np.int32), np.zeros(1, np.int32), ())
    F = int(probe.n_frames[0])
    raw = 50.0 * np.tanh(np.asarray(probe.emg_orig)[0, 8: 8 + 8 * F] / 20.0 / 50.0)
    n_rows = (8 * F + 1599) // 1600
    rows_b = 8 * ((n_rows + 7) // 8)
    flat = np.full((rows_b * 1600, 8), 42.0, np.float32)
    flat[: 8 * F] = raw
    S = 33
    batch = PackedBatch(
        packed_raw=flat.reshape(-1, 1600, 8), n_rows=np.int32(n_rows),
        lengths=np.asarray([F], np.int32), offsets=np.zeros(1, np.int32),
        targets=np.full((1, S), 42, np.int64),
        target_lengths=np.asarray([S], np.int32), n_examples=np.int32(1),
    )
    return compiled, dlm, batch, S


def p50(searcher, batch, target_len, n=11):
    searcher.search(batch, target_len)  # compile + warm
    times = []
    for _ in range(n):
        t0 = time.time()
        searcher.search(batch, target_len)
        times.append(time.time() - t0)
    return float(np.median(times) * 1000.0)


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

    fused = DeviceBeamSearcher(
        model, variables, compiled, dlm,
        DecodeConfig(BeamWidth=100, fused_step=True),
        MAX_FRAMES, max_steps=S - 1,
    )
    assert fused._fused is not None, (
        "fused kernels fell back to the XLA step — the compile probe "
        "rejected them on this backend (check the warning above)"
    )
    xla = DeviceBeamSearcher(
        model, variables, compiled, dlm,
        DecodeConfig(BeamWidth=100, fused_step=False),
        MAX_FRAMES, max_steps=S - 1,
    )

    fh, fs, fw = fused.search(batch, target_len)
    xh, xs, xw = xla.search(batch, target_len)
    print("fused:", list(fh), round(fs, 6), fw)
    print("xla:  ", list(xh), round(xs, 6), xw)
    assert list(fh) == list(xh), "winning hypotheses differ"
    assert fw == xw, "winning word sequences differ"
    assert abs(fs - xs) < 5e-3, f"scores differ: {fs} vs {xs}"

    # vmapped path (search_many / continuous server lanes). The workload is
    # random-init, so the beam is full of near-ties: vmap changes XLA's
    # fusion/rounding on BOTH paths (measured: xla single vs xla vmapped
    # winner scores differ ~1e-3 with equal tokens), and a sub-bf16-rounding
    # wobble can legitimately flip a tie between equal-quality hypotheses.
    # Acceptance: token-identical, OR winner scores within stream-rounding
    # tolerance (each path found an equally-good hypothesis).
    many_f = fused.search_many([batch, batch], [target_len, target_len])
    many_x = xla.search_many([batch, batch], [target_len, target_len])
    for i, ((h1, s1, w1), (h2, s2, w2)) in enumerate(zip(many_f, many_x)):
        if list(h1) == list(h2) and w1 == w2:
            continue
        assert abs(s1 - s2) < 5e-3, (
            f"lane {i}: winners differ beyond rounding: "
            f"{s1} vs {s2} ({w1} vs {w2})"
        )
        print(f"  lane {i}: near-tie flip within rounding "
              f"({s1:.6f} vs {s2:.6f}) — accepted")
    print("search_many agreement: ok")

    pf = p50(fused, batch, target_len)
    px = p50(xla, batch, target_len)
    print(f"beam p50: fused {pf:.2f} ms | xla {px:.2f} ms "
          f"(BeamWidth 100, {S - 1} static steps)")

    # greedy per-row fused path (greedy_decode_cached fused=...)
    from emg_tpu.decode.greedy import greedy_decode_cached
    from emg_tpu.ops.pallas.fused_decode_step import maybe_fused_decoder

    gf = maybe_fused_decoder(cfg_model, variables, 1, S, T=MAX_FRAMES,
                             rows=True)
    assert gf is not None, "greedy rows kernels fell back on this backend"
    ref_out, _ = greedy_decode_cached(model, variables, batch, MAX_FRAMES,
                                      S - 1)
    got_out, _ = greedy_decode_cached(model, variables, batch, MAX_FRAMES,
                                      S - 1, fused=gf)
    agree = (np.asarray(ref_out) == np.asarray(got_out)).all()
    print("greedy fused-vs-xla matrices equal:", bool(agree))

    def t_greedy(fd):
        jax.block_until_ready(
            greedy_decode_cached(model, variables, batch, MAX_FRAMES, S - 1,
                                 fused=fd)[0])
        t0 = time.time()
        for _ in range(5):
            out, _ = greedy_decode_cached(model, variables, batch,
                                          MAX_FRAMES, S - 1, fused=fd)
        jax.block_until_ready(out)
        return (time.time() - t0) / 5 * 1000.0

    print(f"greedy decode: fused {t_greedy(gf):.2f} ms | "
          f"xla {t_greedy(None):.2f} ms (B=1, {S - 1} steps)")
    if not agree:
        raise SystemExit("greedy fused path diverged")


if __name__ == "__main__":
    main()
