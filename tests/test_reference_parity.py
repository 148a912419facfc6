"""Whole-model parity harness against the ACTUAL reference code.

Runs /root/reference/speech_recognition's torch Model (architecture.py:50-188),
greedy decoder (greedy_search.py:7-53) and DSP loader (read_emg.py:57-102)
and asserts this framework reproduces them on identical inputs after
utils/convert.py weight conversion — turning the component-level parity
claims (PARITY.md) into executed end-to-end assertions (VERDICT r1 item 3).
"""

import json
import os

import numpy as np
import pytest

import jax

from emg_tpu.config import ModelConfig
from emg_tpu.data.batching import PackedBatch
from emg_tpu.decode.greedy import run_greedy
from emg_tpu.models import EMGModel
from emg_tpu.utils.convert import convert_reference_state_dict

pytestmark = pytest.mark.slow

if not os.path.isdir("/root/reference/speech_recognition"):
    pytest.skip("reference checkout not available", allow_module_level=True)

torch = pytest.importorskip("torch")

from tests.reference_harness import import_reference, set_tiny_flags  # noqa: E402

LAYERS = 2
HEADS = 4
D_MODEL = 64
CHUNK = 64  # stride-8 CNN -> 8 frames per packed row


@pytest.fixture(scope="module")
def ref():
    ns = import_reference()
    set_tiny_flags(ns["FLAGS"], model_size=D_MODEL, ff=128, layers=LAYERS,
                   heads=HEADS, rel_dist=16)
    return ns


@pytest.fixture(scope="module")
def paired_models(ref):
    """The reference torch Model and our EMGModel carrying its exact
    weights (converted through utils/convert.py)."""
    torch.manual_seed(0)
    tmodel = ref["architecture"].Model(112, 44, 43, "cpu").eval()
    variables = convert_reference_state_dict(
        tmodel.state_dict(), num_layers_encoder=LAYERS, num_layers_decoder=LAYERS
    )
    # decoder_pe="reference_batch": the reference applies its decoder PE
    # over the batch axis (architecture.py:126-127 passes a batch-first
    # tensor into a seq-first PositionalEncoding); bit parity requires
    # replicating that behavior
    jmodel = EMGModel(ModelConfig(
        model_size=D_MODEL, feed_forward_layer_size=128,
        num_layers_encoder=LAYERS, num_layers_decoder=LAYERS,
        n_heads_encoder=HEADS, n_heads_decoder=HEADS,
        relative_distance=16, dropout_model=0.0, dropout_pos_emb=0.0,
        decoder_pe="reference_batch",
    ))
    # converted tree must line up with a fresh init's structure
    init_vars = jmodel.init(
        {"params": jax.random.PRNGKey(0)},
        np.zeros((1, CHUNK, 8), np.float32), np.int32(1),
        np.zeros(1, np.int32), np.full(1, 8, np.int32),
        np.full((1, 4), 42, np.int64), 8, False,
    )
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(init_vars["params"])}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(variables["params"])}
    assert ref_paths == got_paths, (
        f"converter/model tree mismatch: only-in-init {ref_paths - got_paths}, "
        f"only-in-converted {got_paths - ref_paths}"
    )
    variables = {
        "params": jax.tree.map(np.asarray, variables["params"]),
        "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"]),
    }
    return tmodel, jmodel, variables


def _example(seed=0, n_rows=3, lengths=(14, 10), S=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n_rows, CHUNK, 8)).astype(np.float32)
    assert sum(lengths) == n_rows * CHUNK // 8
    y = np.full((len(lengths), S), 42, np.int64)
    for b in range(len(lengths)):
        L = S - 2 + (b % 2)  # unequal target lengths
        y[b, 0] = 41
        y[b, 1 : L - 1] = rng.integers(0, 40, L - 2)
        y[b, L - 1] = 40
    return X, list(lengths), y


def _packed(X, lengths, y):
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)
    return PackedBatch(
        packed_raw=X, n_rows=np.int32(X.shape[0]),
        lengths=np.asarray(lengths, np.int32), offsets=offsets,
        targets=y, target_lengths=np.full(len(lengths), y.shape[1], np.int32),
        n_examples=np.int32(len(lengths)),
    )


def test_training_forward_matches_reference(paired_models):
    """Encoder + decoder logits match the reference forward_training
    (architecture.py:101-139) within float tolerance on identical inputs."""
    tmodel, jmodel, variables = paired_models
    X, lengths, y = _example()
    with torch.no_grad():
        enc_t, dec_t = tmodel(lengths, "cpu",
                              x_raw=torch.tensor(X), y=torch.tensor(y))
    enc_t, dec_t = enc_t.numpy(), dec_t.numpy()

    max_frames = 16
    pb = _packed(X, lengths, y)
    enc_j, dec_j = jmodel.apply(
        variables, pb.packed_raw, pb.n_rows, pb.offsets, pb.lengths,
        pb.targets, max_frames, False,
    )
    enc_j, dec_j = np.asarray(enc_j), np.asarray(dec_j)

    assert enc_t.shape == (2, max(lengths), 44)
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(
            enc_j[b, :L], enc_t[b, :L], rtol=1e-4, atol=1e-4,
            err_msg=f"encoder logits diverge for utterance {b}",
        )
    # decoder: compare at non-pad target positions
    for b in range(y.shape[0]):
        valid = y[b] != 42
        np.testing.assert_allclose(
            dec_j[b, valid], dec_t[b, valid], rtol=1e-4, atol=1e-4,
            err_msg=f"decoder logits diverge for utterance {b}",
        )


def test_search_forward_matches_reference(paired_models):
    """The encoder/decoder split used by both searchers
    (architecture.py:141-188) matches our encode/decode methods."""
    tmodel, jmodel, variables = paired_models
    X, lengths, y = _example(seed=3)
    with torch.no_grad():
        memory_t, enc_t = tmodel(lengths, "cpu", mode="greedy_search",
                                 part="encoder", x_raw=torch.tensor(X))
        dec_t = tmodel(lengths, "cpu", mode="greedy_search", part="decoder",
                       y=torch.tensor(y), memory=memory_t).numpy()

    max_frames = 16
    pb = _packed(X, lengths, y)
    memory_j, enc_j, src_mask = jmodel.apply(
        variables, pb.packed_raw, pb.n_rows, pb.offsets, pb.lengths,
        max_frames, False, method=jmodel.encode,
    )
    dec_j = np.asarray(jmodel.apply(
        variables, pb.targets, memory_j, src_mask, False, method=jmodel.decode,
    ))
    for b, L in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(memory_j)[b, :L], memory_t.numpy()[b, :L],
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(enc_j)[b, :L], enc_t.numpy()[b, :L], rtol=1e-4, atol=1e-4,
        )
    for b in range(y.shape[0]):
        valid = y[b] != 42
        np.testing.assert_allclose(
            dec_j[b, valid], dec_t[b, valid], rtol=1e-4, atol=1e-4,
        )


def test_greedy_decode_matches_reference(ref, paired_models):
    """run_greedy phone strings are identical to the reference decoder
    (greedy_search.py:7-53) under the converted weights."""
    tmodel, jmodel, variables = paired_models
    X, lengths, y = _example(seed=11, S=9)
    target = y[:, 1:]
    with torch.no_grad():
        phones_t, _ = ref["greedy_search"].run_greedy(
            tmodel, lengths, torch.tensor(X), torch.tensor(target), 43, "cpu"
        )

    pb = _packed(X, lengths, y)
    phones_j, _ = run_greedy(
        jmodel, variables, pb, 16, target.shape[1], pb.targets.shape[1] - 1
    )
    assert phones_j[: len(phones_t)] == phones_t


@pytest.fixture(scope="module")
def beam_fixture(paired_models, tmp_path_factory):
    """Both beam stacks over the same tiny lexicon + trigram LM: the
    reference's PrefixTree/BeamSearch (through the kenlm seam) and our
    compiled tree + host BeamSearcher."""
    from tests.reference_harness import import_reference_beam

    from emg_tpu.decode.kenlm_binary import write_kenlm_binary
    from emg_tpu.decode.lm_train import train_arpa, write_arpa
    from emg_tpu.decode.ngram import load_language_model
    from emg_tpu.decode.prefix_tree import init_tree

    ns = import_reference_beam()
    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    phones_f = os.path.join(fixtures, "phonesSet")
    vocab_f = os.path.join(fixtures, "vocabulary")
    lex_f = os.path.join(fixtures, "lexicon.txt")

    td = tmp_path_factory.mktemp("beamlm")
    sents = [
        "the cat sat on a mat", "the dog ran", "a man saw the cat",
        "men ran to the dog", "one two three", "the cat and the dog ran",
        "hello world", "it's done", "a cat sat", "the man and men saw it",
    ]
    arpa = str(td / "lm.arpa")
    write_arpa(train_arpa(sents, order=3), arpa)
    # the reference consumes the LM through kenlm.Model(lm.binary)
    # (PrefixTree.py:288-290); hand it an actual binary via our writer so
    # this test also executes the binary reader under the reference's usage
    binary = str(td / "lm.binary")
    write_kenlm_binary(arpa, binary)

    ref_tree = ns["PrefixTree"].init_tree(phones_f, vocab_f, lex_f)
    ref_lm = ns["PrefixTree"].init_language_model(binary)

    our_tree = init_tree(phones_f, vocab_f, lex_f).compile_tables()
    our_lm = load_language_model(binary)
    return ns, ref_tree, ref_lm, our_tree, our_lm


def test_beam_search_matches_reference(paired_models, beam_fixture):
    """The reference's run_single_bs (BeamSearch.py:41-170) and our host
    BeamSearcher (decode/beam.py) produce identical winning word sequences
    and matching final scores on >= 20 utterances under converted weights —
    the last reference decode path executed head-to-head (VERDICT r4 §6)."""
    from emg_tpu.config import DecodeConfig
    from emg_tpu.decode.beam import BeamSearcher

    tmodel, jmodel, variables = paired_models
    ns, ref_tree, ref_lm, our_tree, our_lm = beam_fixture
    cfg = DecodeConfig()  # BeamWidth 100, LMWeight 0.3, penalties .85/.95
    max_frames = 32
    searcher = BeamSearcher(jmodel, variables, our_tree, our_lm, cfg, max_frames)

    n_match = 0
    for trial in range(20):
        rng = np.random.default_rng(100 + trial)
        n_rows = 3
        L = int(rng.integers(18, 25))  # frames (max 24 = 3*64/8)
        X = rng.normal(size=(n_rows, CHUNK, 8)).astype(np.float32)
        S = int(rng.integers(6, 10))
        y = np.full((1, S), 42, np.int64)
        y[0, 0] = 41
        y[0, 1 : S - 1] = rng.integers(0, 40, S - 2)
        y[0, S - 1] = 40
        target = y[:, 1:]

        with torch.no_grad():
            hist_t, score_t, words_t = ns["BeamSearch"].run_single_bs(
                tmodel, torch.tensor(X), torch.tensor(target), 43,
                ref_tree, ref_lm, "cpu", [L],
            )

        pb = _packed(X, [L], y)
        target_len = int((target != 40).sum())
        hist_j, score_j, words_j = searcher.search(pb, target_len)

        assert words_j == words_t, (
            f"trial {trial}: words diverge {words_j} vs {words_t}"
        )
        assert list(map(int, hist_j)) == [int(t) for t in hist_t], (
            f"trial {trial}: histories diverge"
        )
        # reference accumulates in float32; ours in float64
        assert abs(score_j - score_t) < 5e-3, (trial, score_j, score_t)
        n_match += 1
    assert n_match == 20


def test_dsp_pipeline_matches_reference_loader(ref, tmp_path):
    """dsp/pipeline.preprocess_emg_host reproduces the reference
    load_utterance DSP chain (read_emg.py:57-102) on the same session files,
    including the neighbor-context filtering trick."""
    read_emg = ref["read_emg"]
    data_utils = ref["data_utils"]
    rng = np.random.default_rng(42)
    session = tmp_path / "session"
    session.mkdir()
    arrays = {}
    for i in range(3):
        n = [700, 2000, 600][i]
        arrays[i] = (40 * rng.normal(size=(n, 8))).astype(np.float32)
        np.save(session / f"{i}_emg.npy", arrays[i])
    data_utils.pron_dct = {
        "THE": ["DH", "AH"], "CAT": ["K", "AE", "T"], "SAT": ["S", "AE", "T"],
    }
    with open(session / "1_info.json", "w") as f:
        json.dump({"text": "The cat sat.", "book": "b", "sentence_index": 1,
                   "chunks": []}, f)

    mfccs, emg_features, text, _, phonemes, emg_orig = read_emg.load_utterance(
        str(session), 1
    )

    from emg_tpu.dsp.pipeline import preprocess_emg_host

    feats_j, _, orig_j = preprocess_emg_host(arrays[1], arrays[0], arrays[2])
    # audio is long enough that no mfcc-driven truncation occurred
    assert mfccs.shape[0] >= emg_features.shape[0]
    assert feats_j.shape == emg_features.shape
    assert orig_j.shape == emg_orig.shape
    np.testing.assert_allclose(feats_j, emg_features, rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(orig_j, emg_orig, rtol=5e-2, atol=5e-3)

    # text front-end: same phonemes from the same lexicon
    assert phonemes[0] == "<S>" and phonemes[-1] == "</S>"
    assert phonemes == ["<S>", "DH", "AH", "K", "AE", "T", "S", "AE", "T", "</S>"]
