"""Stage-7 tests: ARPA LM scoring (python + native parity), prefix tree
table compilation, and beam search end-to-end behavior."""

import math
import os

import numpy as np
import pytest

import jax

from emg_tpu.config import DecodeConfig
from emg_tpu.decode import (
    ArpaLanguageModel,
    BeamSearcher,
    init_tree,
    write_fixture_arpa,
)
from emg_tpu.text.phonemes import START_ID

from tests.test_train_step import tiny_model, toy_batch

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "lm.arpa"
    write_fixture_arpa(
        str(p),
        ["the cat sat", "the dog ran", "the cat ran", "a dog sat"],
    )
    return str(p)


def test_arpa_scoring_hand_values(arpa_path):
    lm = ArpaLanguageModel(arpa_path)
    assert lm.order == 2
    # p(the | <s>) = 3/4 occurrences of <s> followed by 'the'
    expected = math.log10(3 / 4)
    got = lm.score("the", bos=True, eos=False)
    assert got == pytest.approx(expected, abs=1e-4)
    # full sentence with eos: p(the|<s>) p(cat|the) p(sat|cat) p(</s>|sat)
    # 'sat' occurs twice, both sentence-final, so p(</s>|sat) = 1
    exp = (
        math.log10(3 / 4) + math.log10(2 / 3) + math.log10(1 / 2) + math.log10(1.0)
    )
    assert lm.score("the cat sat", bos=True, eos=True) == pytest.approx(exp, abs=1e-4)


def test_arpa_backoff(arpa_path):
    lm = ArpaLanguageModel(arpa_path)
    # 'sat dog' bigram unseen: backoff(sat) + p(dog) = -0.30103 + log10(2/N)
    total_unigrams = sum(1 for _ in open(arpa_path) if False) or None
    score = lm.score("sat dog", bos=False, eos=False)
    p_sat = lm.ngrams[1][("sat",)][0]
    p_dog = lm.ngrams[1][("dog",)][0]
    assert score == pytest.approx(p_sat + (-0.30103) + p_dog, abs=1e-4)


def test_arpa_oov(arpa_path):
    lm = ArpaLanguageModel(arpa_path)
    unk = lm.ngrams[1][("<unk>",)][0]
    # unseen word backs off <s> then scores <unk>
    s = lm.score("zzz", bos=False, eos=False)
    assert s == pytest.approx(unk, abs=1e-4)


def test_native_lm_matches_python(arpa_path):
    pytest.importorskip("ctypes")
    try:
        from emg_tpu.decode.lm_binding import NativeArpaLanguageModel

        native = NativeArpaLanguageModel(arpa_path)
    except Exception as e:
        pytest.skip(f"native lm unavailable: {e}")
    py = ArpaLanguageModel(arpa_path)
    for sent, bos, eos in [
        ("the cat sat", True, True),
        ("the dog ran", True, False),
        ("sat dog", False, False),
        ("zzz the cat", True, True),
        ("", True, True),
    ]:
        assert native.score(sent, bos, eos) == pytest.approx(
            py.score(sent, bos, eos), abs=1e-4
        ), sent


def test_prefix_tree_tables():
    tree = init_tree(
        os.path.join(FIXTURES, "phonesSet"),
        os.path.join(FIXTURES, "vocabulary"),
        os.path.join(FIXTURES, "lexicon.txt"),
    )
    dct = tree._dictionary
    # CAT = K AE T reachable
    k = dct.lookup_phone_by_name("K")
    ae = dct.lookup_phone_by_name("AE")
    t = dct.lookup_phone_by_name("T")
    assert tree.is_word([k, ae, t])
    assert not tree.is_word([k, ae])
    succ = {p.name for p in tree.get_successor_phones([k, ae])}
    assert "T" in succ

    ct = tree.compile_tables()
    # walk K->AE->T via tables
    n = ct.child_table[ct.root, k.idx]
    assert n >= 0
    n = ct.child_table[n, ae.idx]
    n = ct.child_table[n, t.idx]
    assert n >= 0
    cat_id = dct.lookup_word_by_name("CAT").idx
    assert cat_id in ct.node_words[n]
    # masks: root allows end token (col 40) and valid first phones
    assert ct.mask_table[ct.root, 40] == 0.0
    assert ct.mask_table[ct.root, k.idx] == 0.0
    # an interior node forbids the end token
    mid = ct.child_table[ct.root, k.idx]
    assert np.isneginf(ct.mask_table[mid, 40])
    # step semantics: end token keeps node in place
    stepped = ct.step(np.array([ct.root]), np.array([40]))
    assert stepped[0] == ct.root


@pytest.mark.slow
def test_beam_search_end_to_end(arpa_path):
    """Beam search over a tiny random model returns lexicon words only."""
    tree = init_tree(
        os.path.join(FIXTURES, "phonesSet"),
        os.path.join(FIXTURES, "vocabulary"),
        os.path.join(FIXTURES, "lexicon.txt"),
    ).compile_tables()
    lm = ArpaLanguageModel(arpa_path)
    model = tiny_model()
    batch = toy_batch(B=1, n_rows=2, chunk=64, S=10, seed=11)
    variables = model.init(
        {"params": jax.random.PRNGKey(3)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    cfg = DecodeConfig(BeamWidth=8, max_hypos=64, extra_steps=4)
    searcher = BeamSearcher(model, variables, tree, lm, cfg, max_frames=16)
    target_len = int((batch.targets[0, 1:] != 40).sum())
    history, score, names = searcher.search(batch, target_len)
    assert history[0] == START_ID
    assert np.isfinite(score)
    # constrained search can only produce vocabulary words
    vocab = {tree.dictionary.lookup_word_by_index(i).name
             for i in tree.dictionary.words_by_index()}
    for n in names:
        assert n in vocab
    # the phone history must spell the word sequence through the lexicon
    assert history[-1] == 40  # ends with </S>


@pytest.mark.slow
def test_beam_search_unconstrained_flag(arpa_path):
    tree = init_tree(
        os.path.join(FIXTURES, "phonesSet"),
        os.path.join(FIXTURES, "vocabulary"),
        os.path.join(FIXTURES, "lexicon.txt"),
    ).compile_tables()
    lm = ArpaLanguageModel(arpa_path)
    model = tiny_model()
    batch = toy_batch(B=1, n_rows=2, chunk=64, S=8, seed=13)
    variables = model.init(
        {"params": jax.random.PRNGKey(5)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    cfg = DecodeConfig(BeamWidth=4, max_hypos=32, extra_steps=2, Constrained=False)
    searcher = BeamSearcher(model, variables, tree, lm, cfg, max_frames=16)
    history, score, names = searcher.search(batch, 5)
    assert history[0] == START_ID


def test_lm_trainer_produces_valid_arpa(tmp_path):
    """Witten-Bell trainer output loads in both scorers and behaves like a
    probability model (sums to ~1, known > unknown)."""
    import math

    from emg_tpu.decode.lm_train import train_arpa, write_arpa

    sents = ["the cat sat", "the dog ran", "the cat ran home", "a dog sat"] * 3
    models = train_arpa(sents, order=3)
    p = tmp_path / "wb.arpa"
    write_arpa(models, str(p))
    lm = ArpaLanguageModel(str(p))
    assert lm.order == 3
    # conditional distribution sums to <= 1 over seen continuations
    mass = sum(
        10 ** lm.ngrams[2][g][0] for g in lm.ngrams[2] if g[0] == "the"
    )
    assert mass < 1.0 + 1e-6
    # frequent sentence scores above a shuffled one
    good = lm.score("the cat sat", bos=True, eos=True)
    bad = lm.score("sat the cat", bos=True, eos=True)
    assert good > bad
    # unknown words hit <unk>, still finite
    assert math.isfinite(lm.score("zzz qqq", bos=True, eos=True))
    # native scorer agrees
    try:
        from emg_tpu.decode.lm_binding import NativeArpaLanguageModel

        native = NativeArpaLanguageModel(str(p))
        assert native.score("the cat sat", True, True) == pytest.approx(good, abs=1e-4)
    except Exception:
        pass


@pytest.mark.slow
def test_beam_long_decode_past_last_bucket(arpa_path):
    """Decodes longer than the largest precompiled step bucket must grow a
    fresh power-of-two bucket instead of overflowing the token buffer
    (regression: `could not broadcast (4,300) into (4,256)`)."""
    from emg_tpu.decode.beam import STEP_BUCKETS, _bucket

    assert _bucket(300, STEP_BUCKETS) == 512
    assert _bucket(700, STEP_BUCKETS) == 1024

    tree = init_tree(
        os.path.join(FIXTURES, "phonesSet"),
        os.path.join(FIXTURES, "vocabulary"),
        os.path.join(FIXTURES, "lexicon.txt"),
    ).compile_tables()
    lm = ArpaLanguageModel(arpa_path)
    model = tiny_model()
    batch = toy_batch(B=1, n_rows=2, chunk=64, S=8, seed=7)
    variables = model.init(
        {"params": jax.random.PRNGKey(7)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    cfg = DecodeConfig(BeamWidth=4, max_hypos=16, extra_steps=4)
    searcher = BeamSearcher(model, variables, tree, lm, cfg, max_frames=16)
    searcher.memory, searcher.mem_mask, searcher.cross_kvs = searcher._encode(batch)
    rng = np.random.default_rng(0)
    histories = np.concatenate(
        [np.full((4, 1), START_ID, np.int32),
         rng.integers(0, 40, (4, 299)).astype(np.int32)], axis=1
    )
    out = searcher._decoder_logprobs(histories, histories.shape[1])
    assert out.shape == (4, 41)
    assert np.all(np.isfinite(out))


def test_beam_unconstrained_no_word_garbage(arpa_path):
    """Unconstrained search must not step tree nodes or emit words
    (regression: node id -1 wrap-around fabricated word emissions)."""
    tree = init_tree(
        os.path.join(FIXTURES, "phonesSet"),
        os.path.join(FIXTURES, "vocabulary"),
        os.path.join(FIXTURES, "lexicon.txt"),
    ).compile_tables()
    lm = ArpaLanguageModel(arpa_path)
    model = tiny_model()
    batch = toy_batch(B=1, n_rows=2, chunk=64, S=8, seed=41)
    variables = model.init(
        {"params": jax.random.PRNGKey(41)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    cfg = DecodeConfig(BeamWidth=6, extra_steps=6, Constrained=False)
    searcher = BeamSearcher(model, variables, tree, lm, cfg, max_frames=16)
    history, score, names = searcher.search(batch, 6)
    assert names == []  # no word emission without constraints
