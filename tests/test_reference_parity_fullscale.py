"""Full-scale parity against the actual reference at flagship geometry.

Round-2 verdict item 3: the toy-scale harness (test_reference_parity.py,
d=64 / 2+2 layers / rel_dist=16) never exercises the converted checkpoint
at the geometry real checkpoints carry — d=768, 6 enc + 6 dec layers, 8
heads, relative_distance=300 (reference architecture.py:12-18) — and in
particular never runs the out-of-range relative-position masking branch
(reference transformer.py:354-359, ours models/attention.py window oob
mask) at real width, where a converter off-by-one would silently destroy
real-checkpoint PER parity. This module runs one T > 300 utterance through
both stacks at full scale and asserts encoder/decoder logits and greedy
strings through utils/convert.py, then gates bf16 serving: the bf16 twin
must agree with f32 on every greedy-relevant argmax whose f32 margin is
non-marginal.
"""

import numpy as np
import pytest

import jax

from emg_tpu.config import ModelConfig
from emg_tpu.data.batching import PackedBatch
from emg_tpu.decode.greedy import run_greedy
from emg_tpu.models import EMGModel
from emg_tpu.utils.convert import convert_reference_state_dict

pytestmark = pytest.mark.slow

import os

if not os.path.isdir("/root/reference/speech_recognition"):
    pytest.skip("reference checkout not available", allow_module_level=True)

torch = pytest.importorskip("torch")

from tests.reference_harness import import_reference, set_tiny_flags  # noqa: E402

# flagship geometry: reference architecture.py:12-18
D_MODEL = 768
FF = 3072
LAYERS = 6
HEADS = 8
REL_DIST = 300
CHUNK = 1600  # the real packed-row length (reference recognition_model.py:77)
N_ROWS = 2  # 2 rows * 1600 / 8 = 400 encoder frames > relative_distance
T_FRAMES = N_ROWS * CHUNK // 8  # 400
S = 20


@pytest.fixture(scope="module")
def ref():
    ns = import_reference()
    set_tiny_flags(ns["FLAGS"], model_size=D_MODEL, ff=FF, layers=LAYERS,
                   heads=HEADS, rel_dist=REL_DIST)
    return ns


@pytest.fixture(scope="module")
def paired_models(ref):
    torch.manual_seed(7)
    tmodel = ref["architecture"].Model(112, 44, 43, "cpu").eval()
    variables = convert_reference_state_dict(
        tmodel.state_dict(), num_layers_encoder=LAYERS,
        num_layers_decoder=LAYERS,
    )
    jmodel = EMGModel(ModelConfig(
        model_size=D_MODEL, feed_forward_layer_size=FF,
        num_layers_encoder=LAYERS, num_layers_decoder=LAYERS,
        n_heads_encoder=HEADS, n_heads_decoder=HEADS,
        relative_distance=REL_DIST, dropout_model=0.0, dropout_pos_emb=0.0,
        decoder_pe="reference_batch",
    ))
    variables = {
        "params": jax.tree.map(np.asarray, variables["params"]),
        "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"]),
    }
    return tmodel, jmodel, variables


def _example(seed=0):
    """One utterance spanning every packed frame: T=400 > rel_dist=300, so
    queries at distance > 300 hit the masking branch at real width."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N_ROWS, CHUNK, 8)).astype(np.float32)
    lengths = [T_FRAMES]
    y = np.full((1, S), 42, np.int64)
    y[0, 0] = 41
    y[0, 1 : S - 1] = rng.integers(0, 40, S - 2)
    y[0, S - 1] = 40
    return X, lengths, y


def _packed(X, lengths, y):
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)
    return PackedBatch(
        packed_raw=X, n_rows=np.int32(X.shape[0]),
        lengths=np.asarray(lengths, np.int32), offsets=offsets,
        targets=y, target_lengths=np.full(len(lengths), y.shape[1], np.int32),
        n_examples=np.int32(len(lengths)),
    )


def test_fullscale_forward_and_greedy_parity(ref, paired_models):
    tmodel, jmodel, variables = paired_models
    X, lengths, y = _example()

    with torch.no_grad():
        memory_t, enc_t = tmodel(lengths, "cpu", mode="greedy_search",
                                 part="encoder", x_raw=torch.tensor(X))
        dec_t = tmodel(lengths, "cpu", mode="greedy_search", part="decoder",
                       y=torch.tensor(y), memory=memory_t).numpy()
    memory_t = memory_t.numpy()
    enc_t = enc_t.numpy()

    pb = _packed(X, lengths, y)
    memory_j, enc_j, src_mask = jmodel.apply(
        variables, pb.packed_raw, pb.n_rows, pb.offsets, pb.lengths,
        T_FRAMES, False, method=jmodel.encode,
    )
    dec_j = np.asarray(jmodel.apply(
        variables, pb.targets, memory_j, src_mask, False,
        method=jmodel.decode,
    ))

    # full-scale accumulates more rounding than the toy harness; scale-aware
    # tolerances (logit magnitudes here are O(1-10))
    np.testing.assert_allclose(np.asarray(memory_j)[0], memory_t[0],
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(enc_j)[0], enc_t[0],
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(dec_j[0], dec_t[0], rtol=1e-3, atol=2e-3)

    # greedy strings through the same converted weights
    target = y[:, 1:]
    with torch.no_grad():
        phones_t, _ = ref["greedy_search"].run_greedy(
            tmodel, lengths, torch.tensor(X), torch.tensor(target), 43, "cpu"
        )
    phones_j, _ = run_greedy(
        jmodel, variables, pb, T_FRAMES, target.shape[1], pb.targets.shape[1] - 1
    )
    assert phones_j[: len(phones_t)] == phones_t


def test_checkpoint_pt_on_disk_schema_round_trip(ref, paired_models, tmp_path):
    """utils/convert.py against the EXACT on-disk schema the reference
    writes (recognition_model.py:310-312: torch.save of the
    nn.DataParallel-wrapped model's state_dict): every key carries the
    ``module.`` prefix, BatchNorms include num_batches_tracked, and the
    dead ``emg_projection`` Linear is present and must be skipped. The
    converted tree must match the live-state_dict conversion leaf-for-leaf
    and carry the exact structure EMGModel.init produces."""
    tmodel, jmodel, variables = paired_models

    wrapped = torch.nn.DataParallel(tmodel)
    sd = wrapped.state_dict()
    # the schema really is the reference's: prefixes, skip-keys, BN counters
    assert all(k.startswith("module.") for k in sd)
    assert "module.emg_projection.weight" in sd
    assert "module.conv_blocks.0.bn1.num_batches_tracked" in sd

    path = tmp_path / "model.pt"
    torch.save(sd, str(path))

    from emg_tpu.utils.convert import load_reference_checkpoint

    converted = load_reference_checkpoint(
        str(path), num_layers_encoder=LAYERS, num_layers_decoder=LAYERS
    )

    # leaf-for-leaf equality with the live conversion (paired_models)
    flat_a = jax.tree_util.tree_flatten_with_path(converted)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(variables)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))

    # structure matches what the flax model itself initializes: same
    # treedef, same shapes (a converter path typo would surface here)
    X, lengths, y = _example()
    pb = _packed(X, lengths, y)
    init_vars = jmodel.init(
        {"params": jax.random.PRNGKey(0)},
        pb.packed_raw, pb.n_rows, pb.offsets, pb.lengths,
        pb.targets[:, :-1], T_FRAMES, False,
    )
    got = jax.tree_util.tree_flatten_with_path(converted)[0]
    want = jax.tree_util.tree_flatten_with_path(
        {"params": init_vars["params"], "batch_stats": init_vars["batch_stats"]}
    )[0]
    assert [p for p, _ in got] == [p for p, _ in want]
    for (pth, a), (_, b) in zip(got, want):
        assert np.asarray(a).shape == np.asarray(b).shape, str(pth)


def test_fullscale_oob_relpos_branch_is_active():
    """Sanity-check the premise: at T=400 > rel_dist=300 the out-of-range
    relative positions actually receive the -1e8 mask (if this fails the
    parity above would be vacuous for the masking branch)."""
    import jax.numpy as jnp

    from emg_tpu.models.attention import LearnedRelativePositionalBias

    bias = LearnedRelativePositionalBias(
        max_relative_pos=REL_DIST, num_heads=HEADS, head_dim=D_MODEL // HEADS
    )
    vs = bias.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, HEADS, 4, D_MODEL // HEADS), jnp.float32),
    )
    used, oob = bias.apply(vs, T_FRAMES, method=bias.window)
    oob = np.asarray(oob)
    assert used.shape == (HEADS, 2 * T_FRAMES - 1, D_MODEL // HEADS)
    pad = T_FRAMES - REL_DIST
    assert pad == 100
    assert (oob[:pad] <= -1e7).all() and (oob[-pad:] <= -1e7).all()
    assert (oob[pad:-pad] == 0).all()


def test_fullscale_bf16_serving_parity(paired_models):
    """The bf16 serving gate (ROADMAP item 10): encoder memory and greedy
    decode-relevant argmaxes of the bf16 twin agree with f32 wherever the
    f32 top-1/top-2 margin is non-marginal, at flagship geometry."""
    tmodel, jmodel, variables = paired_models
    X, lengths, y = _example(seed=5)
    pb = _packed(X, lengths, y)

    jmodel16 = EMGModel(ModelConfig(
        model_size=D_MODEL, feed_forward_layer_size=FF,
        num_layers_encoder=LAYERS, num_layers_decoder=LAYERS,
        n_heads_encoder=HEADS, n_heads_decoder=HEADS,
        relative_distance=REL_DIST, dropout_model=0.0, dropout_pos_emb=0.0,
        decoder_pe="reference_batch", compute_dtype="bfloat16",
    ))

    def fwd(model):
        memory, enc, src_mask = model.apply(
            variables, pb.packed_raw, pb.n_rows, pb.offsets, pb.lengths,
            T_FRAMES, False, method=model.encode,
        )
        dec = model.apply(variables, pb.targets, memory, src_mask, False,
                          method=model.decode)
        return np.asarray(memory, np.float32), np.asarray(dec, np.float32)

    mem32, dec32 = fwd(jmodel)
    mem16, dec16 = fwd(jmodel16)

    # encoder stream: bf16 error stays small relative to activation scale
    scale = np.abs(mem32).mean()
    assert np.abs(mem16 - mem32).mean() < 0.05 * scale

    # greedy-relevant argmax agreement where f32 is decisive: positions
    # whose top-1/top-2 logit margin exceeds the observed bf16 noise
    noise = np.abs(dec16 - dec32).max()
    top2 = np.sort(dec32[0], axis=-1)[:, -2:]
    margin = top2[:, 1] - top2[:, 0]
    decisive = margin > 4.0 * noise
    assert decisive.sum() >= S // 2, (
        f"too few decisive positions to gate on (noise={noise:.3f})"
    )
    a32 = dec32[0].argmax(-1)
    a16 = dec16[0].argmax(-1)
    assert (a32[decisive] == a16[decisive]).all()
