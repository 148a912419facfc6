"""Device-resident beam search: LM-table parity and end-to-end agreement
with the host BeamSearcher."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emg_tpu.config import DecodeConfig
from emg_tpu.decode import ArpaLanguageModel, BeamSearcher, init_tree
from emg_tpu.decode.device_beam import DeviceBeamSearcher
from emg_tpu.decode.device_lm import build_device_lm
from emg_tpu.decode.lm_train import train_arpa, write_arpa

from tests.test_train_step import tiny_model, toy_batch

pytestmark = pytest.mark.slow

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tree = init_tree(
        os.path.join(FIXTURES, "phonesSet"),
        os.path.join(FIXTURES, "vocabulary"),
        os.path.join(FIXTURES, "lexicon.txt"),
    )
    compiled = tree.compile_tables()
    p = tmp_path_factory.mktemp("dlm") / "lm.arpa"
    sents = ["the cat sat", "the dog ran", "the cat ran home", "a dog sat",
             "we go now", "the moon is cold"] * 2
    write_arpa(train_arpa(sents, order=3), str(p))
    lm = ArpaLanguageModel(str(p))
    lex_words = [
        compiled.dictionary.lookup_word_by_index(i).name
        for i in range(compiled.dictionary.word_count())
    ]
    dlm = build_device_lm(lm, lex_words)
    return compiled, lm, dlm, lex_words


def test_device_lm_cond_matches_python(setup):
    compiled, lm, dlm, lex_words = setup
    rng = np.random.default_rng(0)
    # random (context, word) triples over the lexicon vocabulary
    ids = rng.integers(0, len(lex_words), size=(50, 3))
    for c1i, c2i, wi in ids:
        c1w, c2w, ww = (lex_words[c1i].lower(), lex_words[c2i].lower(),
                        lex_words[wi].lower())
        ref = lm._word_score([c1w, c2w], ww)
        ctx = jnp.stack([dlm.lex2lm[jnp.asarray([c1i])],
                         dlm.lex2lm[jnp.asarray([c2i])]], axis=-1)
        got = float(dlm.cond_logp(ctx, dlm.lex2lm[jnp.asarray([wi])])[0])
        assert got == pytest.approx(ref, abs=1e-4), (c1w, c2w, ww)


def test_device_lm_bos_context(setup):
    compiled, lm, dlm, lex_words = setup
    for wi in range(0, len(lex_words), 5):
        ref = lm._word_score(["<s>"], lex_words[wi].lower())
        ctx = dlm.initial_ctx((1,))
        got = float(dlm.cond_logp(ctx, dlm.lex2lm[jnp.asarray([wi])])[0])
        assert got == pytest.approx(ref, abs=1e-4), lex_words[wi]


def test_device_lm_order4_matches_python(tmp_path):
    """Order-N parity (VERDICT r1 item 5): a 4-gram ARPA from lm_train
    scores identically on host and device at its full order, including
    partial contexts and sequential shift_ctx accumulation."""
    sents = ["the cat sat on the mat", "the dog ran to the cat",
             "the cat ran home now", "a dog sat on a mat",
             "we go to the moon", "the moon is cold and far"] * 2
    p = tmp_path / "lm4.arpa"
    write_arpa(train_arpa(sents, order=4), str(p))
    lm = ArpaLanguageModel(str(p))
    assert lm.order == 4
    words = sorted({w for s in sents for w in s.split()}) + ["zzz"]
    dlm = build_device_lm(lm, [w.upper() for w in words])
    assert dlm.order == 4 and dlm.ctx_width == 3

    rng = np.random.default_rng(7)
    # random full and partial contexts
    for _ in range(60):
        k = int(rng.integers(0, 4))  # context length 0..3
        ctx_i = [int(i) for i in rng.integers(0, len(words), size=k)]
        wi = int(rng.integers(0, len(words)))
        ref = lm._word_score([words[i] for i in ctx_i], words[wi])
        ctx = np.full((1, 3), -1, np.int32)
        for j, i in enumerate(ctx_i):
            ctx[0, 3 - k + j] = int(dlm.lex2lm[i])
        got = float(dlm.cond_logp(jnp.asarray(ctx), dlm.lex2lm[jnp.asarray([wi])])[0])
        assert got == pytest.approx(ref, abs=1e-4), (ctx_i, wi)

    # sentence accumulation through initial_ctx/shift_ctx equals lm.score
    sent = "the cat sat on the mat"
    ids = [words.index(w) for w in sent.split()]
    ctx = dlm.initial_ctx((1,))
    total = 0.0
    for i in ids:
        w = dlm.lex2lm[jnp.asarray([i])]
        total += float(dlm.cond_logp(ctx, w)[0])
        ctx = dlm.shift_ctx(ctx, w)
    total += float(dlm.cond_logp(ctx, jnp.asarray([dlm.eos_id]))[0])
    assert total == pytest.approx(lm.score(sent, bos=True, eos=True), abs=1e-3)


def test_device_beam_matches_host(setup):
    compiled, lm, dlm, lex_words = setup
    model = tiny_model()
    agreements = 0
    total = 0
    for seed in (11, 12, 13):
        batch = toy_batch(B=1, n_rows=2, chunk=64, S=10, seed=seed)
        variables = model.init(
            {"params": jax.random.PRNGKey(seed)},
            batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
            batch.targets[:, :-1], 16, False,
        )
        cfg = DecodeConfig(BeamWidth=16, max_hypos=512, extra_steps=12)
        target_len = int((batch.targets[0, 1:] != 40).sum())

        host = BeamSearcher(model, variables, compiled, lm, cfg, 16)
        h_hist, h_score, h_words = host.search(batch, target_len)

        dev = DeviceBeamSearcher(model, variables, compiled, dlm, cfg, 16,
                                 max_steps=target_len + 12)
        d_hist, d_score, d_words = dev.search(batch, target_len)

        if len(h_hist) == 0 or h_hist[-1] != 40 or not np.isfinite(d_score):
            # neither side finished a hypothesis on this random model —
            # fallbacks differ by design, skip the comparison
            continue
        total += 1
        # float32 vs float64 accumulation can flip near-ties; scores of the
        # winning hypotheses must agree closely, sequences usually exactly
        assert d_score == pytest.approx(h_score, abs=5e-3)
        if list(d_hist) == list(h_hist) and d_words == h_words:
            agreements += 1
    assert total >= 2, "searches never finished; test setup too tight"
    assert agreements >= total - 1, (
        f"device/host beams diverged too often: {agreements}/{total}"
    )


def test_device_beam_emits_lexicon_words(setup):
    compiled, lm, dlm, lex_words = setup
    model = tiny_model()
    batch = toy_batch(B=1, n_rows=2, chunk=64, S=10, seed=21)
    variables = model.init(
        {"params": jax.random.PRNGKey(21)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    cfg = DecodeConfig(BeamWidth=8, extra_steps=4)
    dev = DeviceBeamSearcher(model, variables, compiled, dlm, cfg, 16, max_steps=12)
    hist, score, words = dev.search(batch, 8)
    vocab = set(lex_words)
    for w in words:
        assert w in vocab
    assert hist[-1] == compiled.phone_count  # ends with </S>


def test_search_many_matches_single(setup):
    compiled, lm, dlm, lex_words = setup
    model = tiny_model()
    batches, lens, singles = [], [], []
    cfg = DecodeConfig(BeamWidth=8, extra_steps=6)
    variables = None
    for seed in (31, 32, 33):
        b = toy_batch(B=1, n_rows=2, chunk=64, S=10, seed=seed)
        if variables is None:
            variables = model.init(
                {"params": jax.random.PRNGKey(99)},
                b.packed_raw, b.n_rows, b.offsets, b.lengths,
                b.targets[:, :-1], 16, False,
            )
        batches.append(b)
        lens.append(int((b.targets[0, 1:] != 40).sum()))
    dev = DeviceBeamSearcher(model, variables, compiled, dlm, cfg, 16, max_steps=16)
    for b, L in zip(batches, lens):
        singles.append(dev.search(b, L))
    many = dev.search_many(batches, lens)
    for (h1, s1, w1), (h2, s2, w2) in zip(singles, many):
        assert list(h1) == list(h2)
        assert w1 == w2
        assert s1 == pytest.approx(s2, abs=1e-5)


def test_device_lm_large_vocab_keys():
    """Tuple hash tables must handle LM vocabularies whose packed keys
    would overflow int32 (regression for the key-packing scheme)."""
    from emg_tpu.decode.device_lm import _build_tuple_table

    big = 80_000  # > 46341, where id*id packing overflowed int32
    k1 = [big - 1, big - 2, 7]
    k2 = [big - 3, 5, big - 4]
    keys, tv, tb, size = _build_tuple_table([k1, k2], [0.1, 0.2, 0.3], [0.0] * 3)
    stored = {tuple(int(x) for x in row) for row in keys if row[0] >= 0}
    assert (big - 1, big - 3) in stored
    keys3, tv3, _, _ = _build_tuple_table([k1, k2, k2], [0.1, 0.2, 0.3], [0.0] * 3)
    assert (keys3[:, 0] >= -1).all()


def test_continuous_server_matches_single(setup):
    """ContinuousBeamServer (chunked lane advancement with refill) returns
    exactly what one-by-one search does, in request order, with more
    requests than lanes so lane refill and mixed-progress lanes are
    exercised."""
    from emg_tpu.decode.continuous import ContinuousBeamServer

    compiled, lm, dlm, lex_words = setup
    model = tiny_model()
    batches, lens = [], []
    cfg = DecodeConfig(BeamWidth=8, extra_steps=6)
    variables = None
    for seed in (41, 42, 43, 44, 45):
        b = toy_batch(B=1, n_rows=2, chunk=64, S=10, seed=seed)
        if variables is None:
            variables = model.init(
                {"params": jax.random.PRNGKey(7)},
                b.packed_raw, b.n_rows, b.offsets, b.lengths,
                b.targets[:, :-1], 16, False,
            )
        batches.append(b)
        lens.append(int((b.targets[0, 1:] != 40).sum()))
    dev = DeviceBeamSearcher(model, variables, compiled, dlm, cfg, 16,
                             max_steps=16)
    singles = [dev.search(b, L) for b, L in zip(batches, lens)]

    server = ContinuousBeamServer(dev, lanes=2, chunk=3)
    served = server.serve(list(zip(batches, lens)))

    assert len(served) == len(singles)
    for (h1, s1, w1), (h2, s2, w2) in zip(singles, served):
        assert list(h1) == list(h2)
        assert w1 == w2
        assert s1 == pytest.approx(s2, abs=1e-5)


def test_early_exit_matches_static(setup):
    """--decode.beam_scan=early_exit (lax.while_loop stopping at
    _carry_done) returns exactly what the default static-trip scan does,
    across short and long searches."""
    import dataclasses

    compiled, lm, dlm, lex_words = setup
    model = tiny_model()
    cfg = DecodeConfig(BeamWidth=8, extra_steps=6)
    batches, lens = [], []
    variables = None
    for seed in (61, 62, 63):
        b = toy_batch(B=1, n_rows=2, chunk=64, S=10, seed=seed)
        if variables is None:
            variables = model.init(
                {"params": jax.random.PRNGKey(23)},
                b.packed_raw, b.n_rows, b.offsets, b.lengths,
                b.targets[:, :-1], 16, False,
            )
        batches.append(b)
        lens.append(int((b.targets[0, 1:] != 40).sum()))
    # a short search too: target_len 2 exercises the early exit hard
    lens[-1] = 2
    static = DeviceBeamSearcher(model, variables, compiled, dlm, cfg, 16,
                                max_steps=16)
    early = DeviceBeamSearcher(
        model, variables, compiled, dlm,
        dataclasses.replace(cfg, beam_scan="early_exit"), 16, max_steps=16,
    )
    for b, L in zip(batches, lens):
        h1, s1, w1 = static.search(b, L)
        h2, s2, w2 = early.search(b, L)
        assert list(h1) == list(h2)
        assert w1 == w2
        assert s1 == pytest.approx(s2, abs=1e-5)


def test_continuous_server_caps_at_cache_capacity(setup):
    """A request whose target_len + extra_steps exceeds the searcher's
    max_steps must stop at cache capacity (S-1 steps) exactly like the
    one-shot search: without the S-1 gate, a big-chunk advance steps past
    the cache (dynamic_update_slice clamps to and corrupts the last row)
    and can push late hypotheses into the finished buffer (ADVICE r3,
    decode/continuous.py)."""
    from emg_tpu.decode.continuous import ContinuousBeamServer

    compiled, lm, dlm, lex_words = setup
    model = tiny_model()
    cfg = DecodeConfig(BeamWidth=8, extra_steps=20)  # max_len >> S-1
    batches, lens = [], []
    variables = None
    for seed in (51, 52, 53):
        b = toy_batch(B=1, n_rows=2, chunk=64, S=10, seed=seed)
        if variables is None:
            variables = model.init(
                {"params": jax.random.PRNGKey(17)},
                b.packed_raw, b.n_rows, b.offsets, b.lengths,
                b.targets[:, :-1], 16, False,
            )
        batches.append(b)
        lens.append(int((b.targets[0, 1:] != 40).sum()))
    dev = DeviceBeamSearcher(model, variables, compiled, dlm, cfg, 16,
                             max_steps=8)  # S-1 = 8 < target_len + 20
    singles = [dev.search(b, L) for b, L in zip(batches, lens)]

    # chunk larger than the cache so one advance would overrun it
    server = ContinuousBeamServer(dev, lanes=2, chunk=32)
    served = server.serve(list(zip(batches, lens)))
    for (h1, s1, w1), (h2, s2, w2) in zip(singles, served):
        assert list(h1) == list(h2)
        assert w1 == w2
        assert s1 == pytest.approx(s2, abs=1e-5)


def test_search_from_raw_matches_packed_path(setup):
    """search_from_raw (one program: device DSP -> soft clip -> packing ->
    encode -> beam, uploading only the 1 kHz signal) must produce the same
    winner as DSP-ing on the side and shipping the packed rows through
    ``search``. Guards the serving fast path's packing geometry (row
    bucket, the [8, 8+8F) emg_orig alignment, 42.0 padding)."""
    from emg_tpu.data.batching import PackedBatch
    from emg_tpu.dsp.pipeline import preprocess_emg_batched

    compiled, lm, dlm, lex_words = setup
    model = tiny_model()
    rng = np.random.default_rng(3)
    n = 700  # -> raw bucket 1280; F = 58 frames <= max_frames 64
    raw = (120 * rng.normal(size=(n, 8))).astype(np.float32)

    # reference-side path: DSP separately, pack rows, search(batch)
    buf = np.zeros((1, 1280, 8), np.float32)
    buf[0, :n] = raw
    zeros1 = np.zeros(1, np.int32)
    probe = preprocess_emg_batched(
        jnp.asarray(buf), np.asarray([n], np.int32), zeros1, zeros1, ()
    )
    F = int(probe.n_frames[0])
    assert 0 < F <= 64
    clipped = 50.0 * np.tanh(
        np.asarray(probe.emg_orig)[0, 8 : 8 + 8 * F] / 20.0 / 50.0
    )
    flat = np.full((1600, 8), 42.0, np.float32)
    flat[: 8 * F] = clipped
    S = 12
    batch = PackedBatch(
        packed_raw=flat.reshape(1, 1600, 8), n_rows=np.int32(1),
        lengths=np.asarray([F], np.int32), offsets=zeros1,
        targets=np.full((1, S), 42, np.int64),
        target_lengths=np.asarray([S], np.int32), n_examples=np.int32(1),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(5)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 64, False,
    )
    cfg = DecodeConfig(BeamWidth=8, extra_steps=6)
    dev = DeviceBeamSearcher(model, variables, compiled, dlm, cfg, 64,
                             max_steps=14)
    target_len = 6
    h_a, s_a, w_a = dev.search(batch, target_len)
    h_b, s_b, w_b = dev.search_from_raw(raw, target_len)

    assert np.isfinite(s_a) == np.isfinite(s_b)
    if np.isfinite(s_a):
        assert list(h_a) == list(h_b)
        assert w_a == w_b
        assert s_a == pytest.approx(s_b, abs=1e-4)
