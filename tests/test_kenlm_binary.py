"""KenLM binary format: writer/reader round trip vs the ARPA scorer.

The reference consumes ``descriptions/lm.binary`` through kenlm.Model
(reference PrefixTree.py:288-290, recognition_model.py:35); these tests pin
that the repo's PROBING-format writer+reader (decode/kenlm_binary.py)
reproduce the ARPA scorer's numbers exactly, so a binary LM artifact is
consumable on parity day.
"""

import os

import numpy as np
import pytest

from emg_tpu.decode.kenlm_binary import (
    KenlmBinaryModel,
    combine_word_hash,
    is_kenlm_binary,
    murmur_hash64a,
    ngram_key,
    write_kenlm_binary,
)
from emg_tpu.decode.ngram import ArpaLanguageModel, load_language_model
from emg_tpu.decode.lm_train import train_arpa, write_arpa

SENTS = [
    "the cat sat on the mat",
    "the dog ran home",
    "a cat ran to the dog",
    "we go home now",
    "the moon is cold and far",
    "a dog sat by the door",
    "we saw the cat by the moon",
    "the door is far from home",
]


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    td = tmp_path_factory.mktemp("lm")
    path = str(td / "lm.arpa")
    write_arpa(train_arpa(SENTS, order=3), path)
    return path


@pytest.fixture(scope="module")
def binary_path(arpa_path, tmp_path_factory):
    td = tmp_path_factory.mktemp("lmbin")
    path = str(td / "lm.binary")
    write_kenlm_binary(arpa_path, path)
    return path


def test_murmur_hash_basics():
    # deterministic, 64-bit, sensitive to every byte and to length
    h1 = murmur_hash64a(b"the")
    h2 = murmur_hash64a(b"thf")
    h3 = murmur_hash64a(b"th")
    assert h1 != h2 != h3
    assert 0 <= h1 < 2**64
    # 8-byte-block path and tail path both exercised
    assert murmur_hash64a(b"abcdefgh") != murmur_hash64a(b"abcdefg")
    # chain hash: order matters
    assert ngram_key([3, 5]) != ngram_key([5, 3])
    assert combine_word_hash(7, 9) == ngram_key([7, 9])


def test_binary_sniffer(arpa_path, binary_path):
    assert is_kenlm_binary(binary_path)
    assert not is_kenlm_binary(arpa_path)
    assert not is_kenlm_binary(binary_path + ".does_not_exist")


def test_round_trip_scores_match_arpa(arpa_path, binary_path):
    """build binary from ARPA -> load -> scores equal the ARPA scorer
    (the VERDICT r4 'done' criterion for the binary-format reader)."""
    ref = ArpaLanguageModel(arpa_path)
    bin_lm = KenlmBinaryModel(binary_path)
    assert bin_lm.order == ref.order == 3

    queries = SENTS + [
        "the cat",                      # prefix only
        "cold moon door",               # rare word order (backoff paths)
        "zebra quantum cat",            # OOV -> <unk>
        "the the the",                  # repeated
        "",                             # empty sentence (bos+eos bigram)
        "home",
    ]
    for s in queries:
        for bos in (True, False):
            for eos in (True, False):
                a = ref.score(s, bos=bos, eos=eos)
                b = bin_lm.score(s, bos=bos, eos=eos)
                # binary stores float32 log10 probs; ARPA reader is float64
                assert abs(a - b) < 5e-5, (s, bos, eos, a, b)


def test_reader_recovers_vocab_strings(binary_path):
    m = KenlmBinaryModel(binary_path)
    assert m.words[0] == "<unk>"
    assert "cat" in m.words and "<s>" in m.words and "</s>" in m.words
    # ids round-trip through the hash table
    for i, w in enumerate(m.words):
        if w == "<unk>":
            continue
        assert m._id(w) == i, w


def test_load_language_model_sniffs_binary(binary_path, arpa_path):
    m = load_language_model(binary_path)
    ref = load_language_model(arpa_path)
    assert abs(m.score("the cat sat") - ref.score("the cat sat")) < 5e-5


def test_rejects_trie_model_type(binary_path, tmp_path):
    import struct

    with open(binary_path, "rb") as f:
        buf = bytearray(f.read())
    struct.pack_into("<I", buf, 96, 2)  # TRIE
    bad = str(tmp_path / "trie.binary")
    with open(bad, "wb") as f:
        f.write(bytes(buf))
    with pytest.raises(IOError, match="TRIE"):
        KenlmBinaryModel(bad)


def test_bigram_only_model(tmp_path):
    """order-2 model: no middle tables, longest = bigrams."""
    from emg_tpu.decode.ngram import write_fixture_arpa

    arpa = str(tmp_path / "bi.arpa")
    write_fixture_arpa(arpa, SENTS)
    binp = str(tmp_path / "bi.binary")
    write_kenlm_binary(arpa, binp)
    ref = ArpaLanguageModel(arpa)
    m = KenlmBinaryModel(binp)
    assert m.order == 2
    for s in SENTS + ["zebra cat", ""]:
        assert abs(ref.score(s) - m.score(s)) < 5e-5, s
