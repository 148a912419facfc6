"""Aux components: splice_audio, confusion, checkpoint converter,
SizeAwareSampler, EMG-UKA adapter, profiling hooks."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emg_tpu.utils import splice_audio, confusion_matrix, print_confusion, annotate
from emg_tpu.utils.convert import convert_reference_state_dict


def test_splice_audio():
    a = np.ones(100)
    b = np.ones(100)
    out = splice_audio([a, b], 20)
    assert out.shape == (180,)
    # crossfade region sums ramps to ~1
    np.testing.assert_allclose(out[90], 1.0, atol=0.1)
    # result edges are faded (reference behavior)
    assert out[0] == 0.0 and out[-1] == 0.0


def test_confusion(capsys):
    preds = [[0, 1, 2], [1, 1, 0]]
    tgts = [[0, 2, 2], [1, 0, 0]]
    mat = confusion_matrix(preds, tgts)
    assert mat[1, 2] == 1  # predicted AE when target AH... id-level check
    assert mat[0, 0] == 2
    print_confusion(mat, n=3)
    out = capsys.readouterr().out
    assert "Common confusions" in out


def _fake_reference_state_dict(d=16, ff=32, layers=1, heads=2):
    rng = np.random.default_rng(0)
    dh = d // heads
    sd = {}

    def add(name, shape):
        sd["module." + name] = rng.normal(size=shape).astype(np.float32)

    for i in range(3):
        cin = 8 if i == 0 else d
        add(f"conv_blocks.{i}.conv1.weight", (d, cin, 3))
        add(f"conv_blocks.{i}.conv1.bias", (d,))
        for bn in ("bn1", "bn2", "res_norm"):
            add(f"conv_blocks.{i}.{bn}.weight", (d,))
            add(f"conv_blocks.{i}.{bn}.bias", (d,))
            add(f"conv_blocks.{i}.{bn}.running_mean", (d,))
            sd[f"module.conv_blocks.{i}.{bn}.running_var"] = np.abs(
                rng.normal(size=(d,))
            ).astype(np.float32) + 0.5
        add(f"conv_blocks.{i}.conv2.weight", (d, d, 3))
        add(f"conv_blocks.{i}.conv2.bias", (d,))
        add(f"conv_blocks.{i}.residual_path.weight", (d, cin, 1))
        add(f"conv_blocks.{i}.residual_path.bias", (d,))
    add("w_raw_in.weight", (d, d))
    add("w_raw_in.bias", (d,))
    add("embedding_tgt.weight", (43, d))
    for stack, n in (("transformerEncoder", layers), ("transformerDecoder", layers)):
        for i in range(n):
            base = f"{stack}.layers.{i}"
            attns = ["self_attn"] if stack == "transformerEncoder" else [
                "self_attn", "multihead_attn",
            ]
            for a in attns:
                for w, shape in (
                    ("w_q", (heads, d, dh)), ("w_k", (heads, d, dh)),
                    ("w_v", (heads, d, dh)), ("w_o", (heads, dh, d)),
                ):
                    add(f"{base}.{a}.{w}", shape)
            if stack == "transformerEncoder":
                add(f"{base}.self_attn.relative_positional.embeddings", (heads, 15, dh, 1))
            add(f"{base}.linear1.weight", (ff, d))
            add(f"{base}.linear1.bias", (ff,))
            add(f"{base}.linear2.weight", (d, ff))
            add(f"{base}.linear2.bias", (d,))
            norms = ("norm1", "norm2") if stack == "transformerEncoder" else (
                "norm1", "norm2", "norm3",
            )
            for nm in norms:
                add(f"{base}.{nm}.weight", (d,))
                add(f"{base}.{nm}.bias", (d,))
    add("w_aux.weight", (44, d))
    add("w_aux.bias", (44,))
    add("w_out.weight", (43, d))
    add("w_out.bias", (43,))
    return sd


def test_convert_reference_checkpoint_loads_into_model():
    from tests.test_train_step import tiny_model, toy_batch

    sd = _fake_reference_state_dict()
    variables = convert_reference_state_dict(sd, 1, 1)

    model = tiny_model()
    batch = toy_batch()
    # converted tree must structurally match the model's own init
    init = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    init_shapes = jax.tree.map(jnp.shape, init["params"])
    conv_shapes = jax.tree.map(np.shape, variables["params"])
    assert init_shapes == conv_shapes
    # and run a forward pass
    enc, dec = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    assert np.isfinite(np.asarray(enc)).all()
    # spot-check a mapping: linear weights transposed
    np.testing.assert_allclose(
        variables["params"]["w_out"]["kernel"], sd["module.w_out.weight"].T
    )


@pytest.mark.slow
def test_size_aware_sampler(tmp_path):
    from emg_tpu.data.fixtures import make_synthetic_corpus
    from emg_tpu.data.sampler import SizeAwareSampler
    from emg_tpu.config import Config
    from emg_tpu.data.dataset import EMGDataset

    paths = make_synthetic_corpus(str(tmp_path / "c"), n_sentences=4, seed=3)
    cfg = Config()
    cfg.data.silent_data_directories = [paths["silent_data_directories"]]
    cfg.data.voiced_data_directories = paths["voiced_data_directories"].split(",")
    cfg.data.testset_file = paths["testset_file"]
    cfg.paths.dict = paths["dict"]
    ds = EMGDataset(cfg, no_normalizers=True)
    sampler = SizeAwareSampler(ds, max_len=6000, seed=0)
    batches = list(sampler)
    assert len(batches) >= 1
    lengths = dict(zip(range(len(ds)), sampler._lengths))
    for b in batches:
        assert sum(lengths[i] for i in b) <= 6000 + max(lengths.values())


def test_emg_uka_adapter(tmp_path):
    from emg_tpu.data.emg_uka import (
        EMGUKADataset,
        QuantileFilteredSampler,
        UtteranceIndex,
        stack_frames,
    )

    rng = np.random.default_rng(0)
    idx = UtteranceIndex(str(tmp_path / "uka.db"))
    for i in range(10):
        n = int(rng.integers(20, 200 if i < 9 else 2000))
        path = str(tmp_path / f"utt{i}.npy")
        np.save(path, rng.normal(size=(n, 32)).astype(np.float32))
        idx.add("901", "s1", path, n, f"text {i}")
    ds = EMGUKADataset(idx, speaker="901", stack_left=2, stack_right=2)
    assert len(ds) == 10
    ex = ds[0]
    assert ex.features.shape[1] == 32 * 5
    # stacking edge replication
    f = np.arange(12).reshape(4, 3).astype(float)
    st = stack_frames(f, 1, 1)
    np.testing.assert_allclose(st[0, :3], f[0])  # left edge replicated
    np.testing.assert_allclose(st[0, 3:6], f[0])
    sampler = QuantileFilteredSampler(ds, batch_size=2, length_quantile=0.9)
    batches = list(sampler)
    assert all(len(b) == 2 for b in batches)
    # the 2000-frame outlier was filtered
    kept = {i for b in batches for i in b}
    assert 9 not in kept


def test_annotate_context():
    with annotate("test_region"):
        x = jnp.ones(4) + 1
    assert float(x.sum()) == 8.0


def test_debug_flag_forces_cpu_backend(tmp_path):
    """--paths.debug forces CPU execution (reference parity:
    recognition_model.py:25 maps --debug to device='cpu')."""
    import subprocess
    import sys

    script = (
        "import emg_tpu.cli as cli\n"
        "def probe(cfg):\n"
        "    import jax\n"
        "    print('BACKEND=' + jax.default_backend())\n"
        "cli.train = probe\n"
        "cli.main(['--paths.debug=true', '--output_directory', r'%s'])\n"
    ) % str(tmp_path / "out")
    env = dict(os.environ)
    # clear any test-harness CPU forcing so the flag itself must do the work
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        env=env, cwd=repo, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    assert "BACKEND=cpu" in r.stdout
