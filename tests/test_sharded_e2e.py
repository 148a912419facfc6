"""End-to-end *sharded* training on the virtual 8-device CPU mesh:
--parallel.data_axis=4 --parallel.model_axis=2 reachable from the CLI train
entry point, then resume + greedy decode on the sharded params (VERDICT
round-1 item 2: the mesh must be a product capability, not a test-only one).
"""

import os

import numpy as np
import pytest

import jax

from emg_tpu.cli import evaluate_saved_greedy_search, train
from emg_tpu.config import Config
from emg_tpu.data import make_normalizers, make_synthetic_corpus
from emg_tpu.decode.ngram import write_fixture_arpa

pytestmark = [pytest.mark.slow, pytest.mark.nightly]


def _tiny_cfg(root, data_axis, model_axis):
    paths = make_synthetic_corpus(str(root / "corpus"), n_sentences=6, seed=2)
    argv = [
        "--parallel.data_axis", str(data_axis),
        "--parallel.model_axis", str(model_axis),
    ]
    cfg = Config.from_args(argv)
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
    cfg.train.n_epochs = 2
    cfg.train.batch_size_grad = 4
    cfg.train.report_loss = 2
    cfg.train.max_batch_length = 8000
    cfg.train.n_buckets = 4
    make_normalizers(cfg)
    from emg_tpu.data.fixtures import FIXTURE_SENTENCES

    write_fixture_arpa(cfg.paths.lang_model, list(FIXTURE_SENTENCES))
    return cfg


@pytest.fixture(scope="module")
def sharded_trained(tmp_path_factory):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    root = tmp_path_factory.mktemp("sharded_e2e")
    cfg = _tiny_cfg(root, data_axis=4, model_axis=2)
    state = train(cfg)
    return cfg, state


@pytest.mark.slow
def test_sharded_training_via_cli(sharded_trained):
    cfg, state = sharded_trained
    assert int(state.microbatches) > 0
    assert int(state.updates) >= 1
    # params actually landed sharded over the mesh
    leaf = None
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    for path, v in flat:
        names = [str(getattr(k, "key", k)) for k in path]
        if names[-1] in ("w_q", "w_k", "w_v", "w_o"):
            leaf = v
            break
    assert leaf is not None
    assert not leaf.sharding.is_fully_replicated
    assert len(leaf.devices()) == 8
    assert os.path.exists(os.path.join(cfg.paths.output_directory, "latest"))


@pytest.mark.slow
def test_sharded_greedy_eval(sharded_trained):
    cfg, _ = sharded_trained
    cfg.paths.evaluate_saved_greedy_search = cfg.paths.output_directory
    per, acc = evaluate_saved_greedy_search(cfg)
    cfg.paths.evaluate_saved_greedy_search = None
    assert np.isfinite(per)
    assert 0 <= acc <= 100


@pytest.mark.slow
def test_sharded_resume(sharded_trained):
    cfg, state = sharded_trained
    from emg_tpu.data.dataset import EMGDataset
    from emg_tpu.train.checkpoint import CheckpointManager
    from emg_tpu.train.metrics_writer import MetricsWriter
    from emg_tpu.train.trainer import Trainer

    trainset = EMGDataset(cfg)
    devset = EMGDataset(cfg, dev=True)
    writer = MetricsWriter(
        os.path.join(cfg.paths.output_directory, "resume_logs"),
        use_tensorboard=False,
    )
    trainer = Trainer(cfg, trainset, devset, writer)
    assert trainer.mesh is not None
    fresh = trainer.init_state()
    mgr = CheckpointManager(cfg.paths.output_directory)
    restored, extra = mgr.restore(fresh, "latest")
    assert int(restored.microbatches) == int(state.microbatches)
    # one more sharded epoch continues from the restored counters
    cfg.train.n_epochs = 1
    cont = trainer.train(restored)
    assert int(cont.microbatches) > int(restored.microbatches)


def test_sharded_matches_single_device_loss(tmp_path_factory):
    """One microbatch step on the 4x2 mesh produces the same loss as the
    unsharded step on identical params/batch (global-view SPMD equivalence)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from emg_tpu.data.batching import FRAME_BUCKETS, bucket_up
    from emg_tpu.train.metrics_writer import MetricsWriter
    from emg_tpu.train.trainer import Trainer
    from emg_tpu.data.dataset import EMGDataset

    root = tmp_path_factory.mktemp("sharded_equiv")
    cfg = _tiny_cfg(root, data_axis=4, model_axis=2)
    cfg.train.n_epochs = 1
    trainset = EMGDataset(cfg)
    devset = EMGDataset(cfg, dev=True)
    writer = MetricsWriter(str(root / "logs"), use_tensorboard=False)

    sharded_tr = Trainer(cfg, trainset, devset, writer)
    import copy

    cfg_single = copy.deepcopy(cfg)
    cfg_single.parallel.data_axis = -1
    cfg_single.parallel.model_axis = 1
    single_tr = Trainer(cfg_single, trainset, devset, writer)
    assert single_tr.mesh is None

    idxs = list(range(min(4, len(trainset))))
    pb_s, mf_s, _ = sharded_tr._prepare(trainset, idxs)
    pb_1, mf_1, _ = single_tr._prepare(trainset, idxs)

    state_s = sharded_tr.init_state()
    state_1 = single_tr.init_state()
    # same init seed => same params; run one step each
    _, m_s = sharded_tr._train_step_for(mf_s)(state_s, pb_s, sharded_tr.rng)
    _, m_1 = single_tr._train_step_for(mf_1)(state_1, pb_1, single_tr.rng)
    # geometry may differ (dp-padded B rows are masked out), so losses must
    # agree to float tolerance
    np.testing.assert_allclose(
        float(m_s["loss"]), float(m_1["loss"]), rtol=1e-4, atol=1e-4
    )


def test_sequence_sharded_encoder_matches_unsharded(tmp_path_factory):
    """--parallel.sequence_shard shards the encoder stream's time dim over
    the model axis (SURVEY.md §2.3 final row); the sharded step's loss must
    equal the unsharded one's (the constraint only changes layout, XLA
    inserts the attention gathers)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import copy

    from emg_tpu.data.dataset import EMGDataset
    from emg_tpu.train.metrics_writer import MetricsWriter
    from emg_tpu.train.trainer import Trainer

    root = tmp_path_factory.mktemp("seq_shard")
    cfg = _tiny_cfg(root, data_axis=4, model_axis=2)
    cfg.parallel.sequence_shard = True
    cfg.train.n_epochs = 1
    trainset = EMGDataset(cfg)
    devset = EMGDataset(cfg, dev=True)
    writer = MetricsWriter(str(root / "logs"), use_tensorboard=False)

    sp_tr = Trainer(cfg, trainset, devset, writer)
    assert sp_tr.model.cfg.sequence_shard

    cfg_plain = copy.deepcopy(cfg)
    cfg_plain.parallel.sequence_shard = False
    plain_tr = Trainer(cfg_plain, trainset, devset, writer)
    assert not plain_tr.model.cfg.sequence_shard

    idxs = list(range(min(4, len(trainset))))
    pb, mf, _ = sp_tr._prepare(trainset, idxs)
    state_sp = sp_tr.init_state()
    state_pl = plain_tr.init_state()
    _, m_sp = sp_tr._train_step_for(mf)(state_sp, pb, sp_tr.rng)
    _, m_pl = plain_tr._train_step_for(mf)(state_pl, pb, plain_tr.rng)
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_pl["loss"]), rtol=1e-4, atol=1e-4
    )
