"""Large-N device/host beam agreement study (round-2 verdict item 5).

The per-utterance agreement tests (test_device_beam.py) cover a handful of
short synthetic searches; this module decodes 100+ mixed-length utterances
of a trained model through the host BeamSearcher (reference-exact float64
scoring), the one-launch DeviceBeamSearcher (float32), and the
continuous-batching server, then

- asserts the continuous server reproduces the one-shot device search
  exactly (same step body, lanes must be inert),
- characterizes the float32-vs-float64 reordering rate between host and
  device word outputs, and
- asserts the task metric (WER against the synthetic-corpus texts) agrees
  between the two scorers within noise.

Numbers from a run of this module are recorded in VALIDATION.md.
"""

import os

import numpy as np
import pytest

from emg_tpu.cli import _prepare_single, train
from emg_tpu.config import Config
from emg_tpu.data import make_normalizers, make_synthetic_corpus
from emg_tpu.data.dataset import EMGDataset
from emg_tpu.decode import ArpaLanguageModel, BeamSearcher, init_tree
from emg_tpu.decode.continuous import ContinuousBeamServer
from emg_tpu.decode.device_beam import DeviceBeamSearcher
from emg_tpu.decode.device_lm import build_device_lm
from emg_tpu.decode.lm_train import train_arpa, write_arpa
from emg_tpu.models import EMGModel
from emg_tpu.text.metrics import wer
from emg_tpu.text.phonemes import TextTransform

pytestmark = pytest.mark.slow

N_SENTENCES = 50  # the corpus yields ~2N+1 utterances across its sessions


@pytest.fixture(scope="module")
def study(tmp_path_factory):
    root = tmp_path_factory.mktemp("agree")
    paths = make_synthetic_corpus(
        str(root / "corpus"), n_sentences=N_SENTENCES, seed=5
    )
    cfg = Config()
    cfg.data.silent_data_directories = [paths["silent_data_directories"]]
    cfg.data.voiced_data_directories = paths["voiced_data_directories"].split(",")
    cfg.data.testset_file = paths["testset_file"]
    cfg.paths.dict = paths["dict"]
    cfg.paths.phonesSet = paths["phonesSet"]
    cfg.paths.vocabulary = paths["vocabulary"]
    cfg.data.normalizers_file = str(root / "normalizers.pkl")
    cfg.paths.output_directory = str(root / "out")
    cfg.paths.lang_model = str(root / "lm.arpa")
    cfg.model.model_size = 16
    cfg.model.feed_forward_layer_size = 32
    cfg.model.num_layers_encoder = 1
    cfg.model.num_layers_decoder = 1
    cfg.model.n_heads_encoder = 2
    cfg.model.n_heads_decoder = 2
    cfg.model.relative_distance = 8
    cfg.model.dropout_model = 0.0
    cfg.model.dropout_pos_emb = 0.0
    cfg.train.n_epochs = 3
    cfg.train.batch_size_grad = 4
    cfg.train.report_loss = 10**6  # no eval interruptions
    cfg.train.report_PER = 10**6
    cfg.train.max_batch_length = 8000
    cfg.train.n_buckets = 4
    cfg.decode.BeamWidth = 8
    cfg.decode.max_hypos = 64
    cfg.decode.extra_steps = 3

    make_normalizers(cfg)
    from emg_tpu.data.fixtures import FIXTURE_SENTENCES

    write_arpa(train_arpa(list(FIXTURE_SENTENCES), order=3),
               cfg.paths.lang_model)
    state = train(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    model = EMGModel(cfg.model)
    return cfg, model, variables


def _prepared_pool(cfg):
    """Every utterance of the corpus (train + dev + test), prepared."""
    tt = TextTransform()
    pool = []
    for kw in ({"dev": False, "test": False}, {"dev": True}, {"test": True}):
        ds = EMGDataset(cfg, **kw)
        for i in range(len(ds)):
            pb, max_frames, raw = _prepare_single(cfg, ds, i)
            target = raw["phonemes_int"][0][1:]
            target_len = int((target != 40).sum())
            pool.append((pb, max_frames, target_len,
                         tt.clean_text(raw["text"][0])))
    return pool


def test_agreement_at_scale(study):
    cfg, model, variables = study
    pool = _prepared_pool(cfg)
    assert len(pool) >= 100, f"pool too small: {len(pool)}"

    tree = init_tree(cfg.paths.phonesSet, cfg.paths.vocabulary, cfg.paths.dict)
    compiled = tree.compile_tables()
    lm = ArpaLanguageModel(cfg.paths.lang_model)
    lex_words = [
        compiled.dictionary.lookup_word_by_index(i).name
        for i in range(compiled.dictionary.word_count())
    ]
    dlm = build_device_lm(lm, lex_words)

    host_searchers, dev_searchers, servers = {}, {}, {}
    step_cap_of = {}
    results_h, results_d, results_c = [], [], []
    refs = []
    for pb, max_frames, target_len, text in pool:
        if max_frames not in host_searchers:
            host_searchers[max_frames] = BeamSearcher(
                model, variables, compiled, lm, cfg.decode, max_frames
            )
        step_cap = 16 * ((target_len + cfg.decode.extra_steps + 15) // 16)
        skey = (max_frames, step_cap)
        if skey not in dev_searchers:
            dev_searchers[skey] = DeviceBeamSearcher(
                model, variables, compiled, dlm, cfg.decode, max_frames,
                max_steps=step_cap,
            )
            servers[skey] = ContinuousBeamServer(dev_searchers[skey], lanes=2)
        _, h_score, h_words = host_searchers[max_frames].search(pb, target_len)
        _, d_score, d_words = dev_searchers[skey].search(pb, target_len)
        (c_out,) = servers[skey].serve([(pb, target_len)])
        results_h.append((h_score, h_words))
        results_d.append((d_score, d_words))
        results_c.append((c_out[1], c_out[2]))
        refs.append(text)

    # 1. continuous server == one-shot device search, utterance by utterance
    for (ds, dw), (cs, cw) in zip(results_d, results_c):
        assert dw == cw
        assert cs == pytest.approx(ds, abs=1e-6)

    # 2. host/device agreement: identical word outputs except float32
    # near-tie reorders, whose winning scores must still agree closely
    n = len(pool)
    exact = sum(1 for (_, hw), (_, dw) in zip(results_h, results_d)
                if hw == dw)
    for (hs, hw), (dscore, dw) in zip(results_h, results_d):
        if hw != dw and np.isfinite(hs) and np.isfinite(dscore):
            assert dscore == pytest.approx(hs, abs=2e-2), (hw, dw)
    agree_rate = exact / n
    assert agree_rate >= 0.9, f"agreement rate {agree_rate:.3f} over {n}"

    # 3. the task metric agrees between scorers
    tt = TextTransform()
    wer_h = wer(refs, [tt.clean_text(" ".join(w)) for _, w in results_h])
    wer_d = wer(refs, [tt.clean_text(" ".join(w)) for _, w in results_d])
    print(f"\nAGREEMENT STUDY: n={n} exact={exact} rate={agree_rate:.4f} "
          f"WER host={wer_h:.4f} device={wer_d:.4f}")
    assert abs(wer_h - wer_d) <= 0.02
