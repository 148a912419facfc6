"""Split the device-beam step cost: decoder pass vs search machinery.

The r4 verdict poses a fork for the beam hot loop: build a winning
single-kernel-per-layer decoder step, or measure that the relay floor +
non-decoder machinery make ≤50 ms unreachable and prune the fused path.
This probe produces that measurement: it times the full search against a
search whose decoder pass is replaced by a constant-logits stub (every
other per-step op — top_k over (H,41), prefix-tree gathers, device-LM
probes, finished-buffer merges, cache re-alignment gathers — unchanged),
so the difference is exactly the decoder's marginal cost per step.

Run: python benchmarks/beam_step_split.py
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
from emg_tpu.decode.device_beam import DeviceBeamSearcher  # noqa: E402


class StubDecoderSearcher(DeviceBeamSearcher):
    """decode_lp replaced by cached-constant logits; everything else real."""

    def _step_fn(self):
        body = super()._step_fn()
        W = self.W
        # decode_step returns the full 43-logit head; the searcher drops
        # <S>/<PAD> and log-softmaxes afterward (device_beam.py:196)
        const_logits = jnp.tile(
            ((jnp.arange(43, dtype=jnp.float32) % 7.0) * 0.3)[None], (W, 1)
        )

        # intercept the decoder at trace time: the real body's decode_lp
        # routes through model.apply(..., method=model.decode_step); patch
        # apply to return constant logits + unchanged caches while THIS
        # body traces, leaving every other per-step op real
        model = self.model
        real_apply = model.apply

        def fake_apply(variables, *args, method=None, **kw):
            if method is not None and getattr(method, "__name__", "") == "decode_step":
                caches = args[2]
                return const_logits.astype(jnp.float32), caches
            return real_apply(variables, *args, method=method, **kw)

        def body_stub(variables, sctx, carry):
            model.apply = fake_apply
            try:
                out = body(variables, sctx, carry)
            finally:
                model.apply = real_apply
            return out

        return body_stub


def amortized_ms(fn, variables, batch, ml, n=10):
    jax.block_until_ready(fn(variables, batch, ml))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [fn(variables, batch, ml) for _ in range(n)]
        jax.block_until_ready(outs[-1])
        best = min(best, (time.time() - t0) / n * 1000.0)
    return best


def main():
    run_once, utts, geo, model, variables, stages = bench.build_greedy_pipeline()

    from emg_tpu.decode import ArpaLanguageModel, init_tree
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
    batch = jax.tree.map(jnp.asarray, batch)
    ml = jnp.int32(target_len + bench.DecodeConfig().extra_steps)
    dcfg = bench.DecodeConfig(BeamWidth=100)

    full = DeviceBeamSearcher(model, variables, compiled, dlm, dcfg,
                              bench.MAX_FRAMES, max_steps=S - 1)
    fn_full = full._build()
    t_full = amortized_ms(fn_full, full.variables, batch, ml)

    stub = StubDecoderSearcher(model, variables, compiled, dlm, dcfg,
                               bench.MAX_FRAMES, max_steps=S - 1)
    fn_stub = stub._build()
    t_stub = amortized_ms(fn_stub, stub.variables, batch, ml)

    # encoder-only reference point (same program minus the step loop):
    # stub already includes encode; report it for the budget table
    n_steps = target_len + bench.DecodeConfig().extra_steps
    print({
        "search_full_amortized_ms": round(t_full, 2),
        "search_stub_decoder_amortized_ms": round(t_stub, 2),
        "decoder_total_ms": round(t_full - t_stub, 2),
        "decoder_per_step_ms": round((t_full - t_stub) / n_steps, 3),
        "machinery_note": "stub keeps encode+topk+LM+tree+cache gathers",
        "n_steps": n_steps,
    })


if __name__ == "__main__":
    main()
