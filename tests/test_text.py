"""Stage-1 tests: phoneme inventory, codecs, number spelling, normalization,
lexicon, and WER scoring (every other layer's correctness is judged in
phoneme space — SURVEY.md §7.1)."""

import os

import pytest

from emg_tpu.text import (
    PHONEME_INVENTORY,
    PAD_ID,
    START_ID,
    END_ID,
    BLANK_ID,
    PhoneTransform,
    TextTransform,
    Dictionary,
    load_pronunciation_dict,
    read_phonemes,
    wer,
    edit_distance,
)
from emg_tpu.text.numbers import num2words
from emg_tpu.text.normalize import normalize_sentence, load_pron_dict

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_inventory_indices_exact():
    # bit-for-bit parity targets (reference data_utils.py:19)
    assert len(PHONEME_INVENTORY) == 43
    assert PHONEME_INVENTORY[0] == "AA"
    assert PHONEME_INVENTORY[39] == "ZH"
    assert END_ID == 40 and PHONEME_INVENTORY[40] == "</S>"
    assert START_ID == 41 and PHONEME_INVENTORY[41] == "<S>"
    assert PAD_ID == 42 and PHONEME_INVENTORY[42] == "<PAD>"
    assert BLANK_ID == 43
    # spot-check a few interior positions
    assert PHONEME_INVENTORY.index("IX") == 17
    assert PHONEME_INVENTORY.index("S") == 29


def test_phone_transform_roundtrip():
    pt = PhoneTransform()
    assert pt.phone_to_int(["<S>", "HH", "AH", "</S>"]) == [41, 15, 2, 40]
    # int_to_phone concatenates without separators (reference behavior)
    assert pt.int_to_phone([15, 2]) == "HHAH"


def test_text_transform():
    tt = TextTransform()
    assert tt.vocabulary_size == 1 + 26 + 10 + 1
    assert tt.clean_text("Hello, World!") == "hello world"
    assert tt.clean_text("it’s fine") == "its fine"
    ints = tt.text_to_int("ab 1")
    assert tt.int_to_text(ints) == "ab 1"


@pytest.mark.parametrize(
    "n,expected",
    [
        (0, "zero"),
        (7, "seven"),
        (15, "fifteen"),
        (21, "twenty-one"),
        (100, "one hundred"),
        (101, "one hundred and one"),
        (577, "five hundred and seventy-seven"),
        (1100, "one thousand, one hundred"),
        (1577, "one thousand, five hundred and seventy-seven"),
        (1050, "one thousand and fifty"),
        (2000001, "two million and one"),
        (1000000, "one million"),
    ],
)
def test_num2words(n, expected):
    assert num2words(n) == expected


def test_normalize_sentence():
    assert normalize_sentence("Hello, world!") == ["HELLO", "WORLD"]
    # digits expanded, hyphens split
    assert normalize_sentence("I saw 21 cats.") == [
        "I", "SAW", "TWENTY", "ONE", "CATS",
    ]
    # underscores and pound sign pre-substituted
    assert normalize_sentence("a_b £5 x") == ["A", "B", "POUND", "FIVE", "X"]
    # trailing digit run is dropped (reference parity quirk)
    assert normalize_sentence("chapter 12") == ["CHAPTER"]
    # commas inside numbers are skipped
    assert normalize_sentence("1,577 men!") == [
        "ONE", "THOUSAND", "FIVE", "HUNDRED", "AND", "SEVENTY", "SEVEN", "MEN",
    ]
    # curly apostrophes normalized
    assert normalize_sentence("it’s done") == ["IT'S", "DONE"]


def test_read_phonemes_with_fixture_lexicon():
    pron = load_pron_dict(os.path.join(FIXTURES, "lexicon.txt"))
    phones = read_phonemes("the cat sat", pron)
    assert phones[0] == "<S>" and phones[-1] == "</S>"
    assert phones == ["<S>", "DH", "AH", "K", "AE", "T", "S", "AE", "T", "</S>"]
    # unknown words are skipped with a warning
    phones = read_phonemes("the zzznotaword cat", pron)
    assert phones == ["<S>", "DH", "AH", "K", "AE", "T", "</S>"]


def test_dictionary():
    dct = Dictionary()
    for p in ["AA", "B", "K"]:
        dct.add_phone(p)
    w = dct.add_word("BACK")
    dct.add_pronunciation(w, [dct.lookup_phone_by_name(p) for p in ["B", "AA", "K"]])
    assert dct.phone_count() == 3
    assert dct.lookup_phone_by_index(1).name == "B"
    assert dct.lookup_word_by_name("BACK").idx == 0
    prons = dct.lookup_prons("BACK")
    assert [p.name for p in prons[0]] == ["B", "AA", "K"]


def test_load_pronunciation_dict_fixture():
    dct = load_pronunciation_dict(
        os.path.join(FIXTURES, "phonesSet"),
        os.path.join(FIXTURES, "vocabulary"),
        os.path.join(FIXTURES, "lexicon.txt"),
    )
    assert dct.phone_count() == 40
    assert dct.word_count() >= 10
    assert [p.name for p in dct.lookup_prons("CAT")[0]] == ["K", "AE", "T"]


def test_edit_distance():
    assert edit_distance("abc", "abc") == 0
    assert edit_distance("abc", "axc") == 1
    assert edit_distance("abc", "") == 3
    assert edit_distance([], ["x"]) == 1


def test_wer():
    assert wer("a b c", "a b c") == 0.0
    assert wer("a b c", "a x c") == pytest.approx(1 / 3)
    # corpus-level pooling: total errors / total reference words
    assert wer(["a b", "c d e"], ["a b", "c x e"]) == pytest.approx(1 / 5)
    assert wer("", "") == 0.0
