"""L1 data-collection layer: synthetic-board recording, session files,
book source, and the denoiser — ending with the recorded session being
loadable by EMGDataset (capture -> training-data round trip)."""

import json
import os

import numpy as np
import pytest

from emg_tpu.collect import (
    Book,
    Recorder,
    RecordingSession,
    clean_directory,
    get_last_sequence,
    reduce_noise,
)


def test_synthetic_recorder_streams():
    with Recorder(debug=True) as r:
        for _ in range(12):
            r.update()
        emg, audio, button, chunks = r.get_data()
    assert emg.shape[0] > 0 and emg.shape[1] == 8
    assert audio.shape[0] > 0
    assert len(chunks) > 0
    assert all(len(c) == 3 for c in chunks)
    assert r.dropped_samples == 0  # synthetic counter is continuous


def test_get_last_sequence_pads_and_trims():
    chunks = [np.ones((30, 2)), 2 * np.ones((50, 2))]
    out = get_last_sequence(chunks, 60, 2, False, 1000)
    assert out.shape == (60, 2)
    np.testing.assert_allclose(out[-50:], 2.0)
    out = get_last_sequence([np.ones((10, 2))], 60, 2, False, 1000)
    assert out.shape == (60, 2)
    np.testing.assert_allclose(out[:50], 0.0)


def test_book_bookmark(tmp_path):
    book_file = tmp_path / "book.txt"
    book_file.write_text("First sentence. Second one! Third?\n\nFourth paragraph.")
    with Book(str(book_file)) as b:
        assert len(b.sentences) == 4
        assert b.current_sentence().startswith("First")
        b.next()
        b.next()
    # bookmark persisted
    with Book(str(book_file)) as b2:
        assert b2.current_index == 2
        assert b2.current_sentence().startswith("Third")


def test_recording_session_files(tmp_path):
    book_file = tmp_path / "book.txt"
    book_file.write_text("The cat sat. A dog ran. We go now.")
    out = tmp_path / "session"
    with Recorder(debug=True) as r, Book(str(book_file)) as book:
        session = RecordingSession(str(out), book, r)
        session.begin()
        for _ in range(6):
            r.update()
        session.next()  # writes 0_* (silence)
        for _ in range(6):
            r.update()
        session.next()  # writes 1_* (first sentence)
        for _ in range(6):
            r.update()
        session.restart()  # writes two silence boundary clips
        session.quit()

    files = sorted(os.listdir(out))
    assert "0_info.json" in files and "1_info.json" in files
    info0 = json.load(open(out / "0_info.json"))
    assert info0["sentence_index"] == -1
    info1 = json.load(open(out / "1_info.json"))
    assert info1["sentence_index"] == 0
    assert info1["text"].startswith("The cat")
    assert sum(c[0] for c in info1["chunks"]) == np.load(out / "1_emg.npy").shape[0]
    # restart wrote silence clips 2 and 3, quit wrote 4
    assert json.load(open(out / "2_info.json"))["sentence_index"] == -1
    assert json.load(open(out / "4_info.json"))["sentence_index"] == -1


def test_reduce_noise_attenuates_noise_floor():
    rng = np.random.default_rng(0)
    rate = 16000
    noise = 0.05 * rng.normal(size=rate)
    t = np.arange(rate) / rate
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    noisy = tone + 0.05 * rng.normal(size=rate)
    clean = reduce_noise(noisy, noise)
    # quiet section energy drops, tone largely preserved
    assert np.abs(clean).max() > 0.2
    quiet = 0.05 * rng.normal(size=rate)
    cleaned_quiet = reduce_noise(quiet, noise)
    assert np.sqrt((cleaned_quiet ** 2).mean()) < 0.5 * np.sqrt((quiet ** 2).mean())


@pytest.mark.slow
def test_clean_directory_and_dataset_roundtrip(tmp_path):
    """Record with the synthetic board, denoise, then load the session with
    EMGDataset — the full capture-to-training-data path."""
    book_file = tmp_path / "book.txt"
    book_file.write_text("The cat sat on a mat. The dog ran.")
    out = tmp_path / "sess0"
    with Recorder(debug=True) as r, Book(str(book_file)) as book:
        session = RecordingSession(str(out), book, r)
        session.begin()
        for _ in range(10):
            r.update()
        session.next()
        # record enough for featurization (>= a few hundred ms)
        for _ in range(80):
            r.update()
        session.next()
        session.quit()

    written = clean_directory(str(out))
    assert any(w.endswith("_audio_clean.wav") or w.endswith("_audio_clean.flac") for w in written)

    from emg_tpu.config import Config
    from emg_tpu.data.dataset import EMGDataset

    cfg = Config()
    cfg.paths.dict = os.path.join(os.path.dirname(__file__), "fixtures", "lexicon.txt")
    ds = EMGDataset(cfg, base_dir=str(out), no_testset=True, no_normalizers=True)
    assert len(ds) >= 1
    ex = ds[0]
    assert ex["emg"].shape[1] == 112
    assert ex["phonemes_int"][0] == 41
