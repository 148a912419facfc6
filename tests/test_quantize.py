"""int8 decode-stack quantization (ROADMAP item 6 / round-2 verdict item 8).

Pins: (a) the Int8Tensor pytree/`__jax_array__` mechanics through the exact
consumer paths the model uses (attention einsum via jnp.asarray, flax Dense
via promote_dtype, under jit with the variables as an argument); (b) the
quantization error bound; (c) token parity of the quantized decoder against
the bf16 serving path at tiny scale — teacher-forced decode argmaxes agree
wherever the bf16 margin is decisive, and the device beam emits the same
winning word sequence on a majority of random models.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emg_tpu.config import DecodeConfig, ModelConfig
from emg_tpu.models import EMGModel
from emg_tpu.utils.quantize import (
    Int8Tensor,
    quantize_decoder_int8,
    quantize_tensor,
)

from tests.test_train_step import toy_batch


def tiny_bf16_model():
    return EMGModel(ModelConfig(
        model_size=16, feed_forward_layer_size=32,
        num_layers_encoder=1, num_layers_decoder=1,
        n_heads_encoder=2, n_heads_decoder=2, relative_distance=8,
        dropout_model=0.0, dropout_pos_emb=0.0, compute_dtype="bfloat16",
    ))


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 32, 8)).astype(np.float32)
    qt = quantize_tensor(w, (1,), dequant_dtype=jnp.float32)
    deq = np.asarray(jnp.asarray(qt))
    # per-(h, out-channel) error bounded by half an LSB of that channel
    lsb = np.abs(w).max(axis=1, keepdims=True) / 127.0
    assert (np.abs(deq - w) <= 0.5 * lsb + 1e-7).all()


def test_int8_tensor_through_flax_dense_and_jit():
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(8, name="d", dtype=x.dtype)(x)

    m = M()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    k = np.asarray(v["params"]["d"]["kernel"])
    v2 = {"params": {"d": {"kernel": quantize_tensor(k, (0,)),
                           "bias": v["params"]["d"]["bias"]}}}
    y16 = m.apply(v, x.astype(jnp.bfloat16))
    yq = jax.jit(m.apply)(v2, x.astype(jnp.bfloat16))
    # int8 error at this width stays within a few bf16 LSBs
    assert float(jnp.abs(y16.astype(jnp.float32) - yq.astype(jnp.float32)).max()) < 0.1


def test_quantize_targets_only_decoder_matmuls():
    model = tiny_bf16_model()
    batch = toy_batch(B=1, n_rows=2, chunk=64, S=10, seed=3)
    variables = model.init(
        {"params": jax.random.PRNGKey(3)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    qv = quantize_decoder_int8(variables)
    flat = jax.tree_util.tree_flatten_with_path(
        qv["params"], is_leaf=lambda x: isinstance(x, Int8Tensor)
    )[0]
    q_paths = ["/".join(getattr(p, "key", str(p)) for p in path)
               for path, leaf in flat if isinstance(leaf, Int8Tensor)]
    assert q_paths, "nothing was quantized"
    for p in q_paths:
        assert "transformerDecoder" in p
        assert not p.endswith("bias")
    # decoder: 1 layer x (self 4 + cross 4 + 2 ffn kernels) = 10
    assert len(q_paths) == 10
    # idempotent
    qv2 = quantize_decoder_int8(qv)
    flat2 = jax.tree_util.tree_flatten_with_path(
        qv2["params"], is_leaf=lambda x: isinstance(x, Int8Tensor)
    )[0]
    assert sum(isinstance(l, Int8Tensor) for _, l in flat2) == len(q_paths)


def test_teacher_forced_decode_parity_int8():
    """Quantized decoder logits agree with bf16 on every argmax whose bf16
    top-1/top-2 margin exceeds the observed int8 noise."""
    model = tiny_bf16_model()
    decisive_total = 0
    for seed in (5, 6, 7):
        batch = toy_batch(B=1, n_rows=2, chunk=64, S=12, seed=seed)
        variables = model.init(
            {"params": jax.random.PRNGKey(seed)},
            batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
            batch.targets[:, :-1], 16, False,
        )
        memory, _, src_mask = model.apply(
            variables, batch.packed_raw, batch.n_rows, batch.offsets,
            batch.lengths, 16, False, method=model.encode,
        )
        def dec(v):
            return np.asarray(model.apply(
                v, batch.targets, memory, src_mask, False, method=model.decode,
            ), np.float32)

        d16 = dec(variables)
        dq = dec(quantize_decoder_int8(variables))
        noise = np.abs(dq - d16).max()
        top2 = np.sort(d16[0], axis=-1)[:, -2:]
        margin = top2[:, 1] - top2[:, 0]
        decisive = margin > 4.0 * noise
        decisive_total += int(decisive.sum())
        assert (d16[0].argmax(-1)[decisive] == dq[0].argmax(-1)[decisive]).all()
    assert decisive_total >= 12, "too few decisive positions to gate on"


@pytest.mark.slow
def test_device_beam_parity_int8():
    """The int8-quantized device beam finds the same winning words as the
    bf16 beam on a majority of random tiny models, with close scores."""
    import os

    from emg_tpu.decode import ArpaLanguageModel, init_tree
    from emg_tpu.decode.device_beam import DeviceBeamSearcher
    from emg_tpu.decode.device_lm import build_device_lm
    from emg_tpu.decode.lm_train import train_arpa, write_arpa

    FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
    tree = init_tree(
        os.path.join(FIXTURES, "phonesSet"),
        os.path.join(FIXTURES, "vocabulary"),
        os.path.join(FIXTURES, "lexicon.txt"),
    )
    compiled = tree.compile_tables()
    import tempfile

    p = os.path.join(tempfile.mkdtemp(), "lm.arpa")
    sents = ["the cat sat", "the dog ran", "the cat ran home", "a dog sat",
             "we go now", "the moon is cold"] * 2
    write_arpa(train_arpa(sents, order=3), p)
    lm = ArpaLanguageModel(p)
    lex_words = [
        compiled.dictionary.lookup_word_by_index(i).name
        for i in range(compiled.dictionary.word_count())
    ]
    dlm = build_device_lm(lm, lex_words)

    model = tiny_bf16_model()
    agree = total = 0
    for seed in (41, 42, 43):
        batch = toy_batch(B=1, n_rows=2, chunk=64, S=10, seed=seed)
        variables = model.init(
            {"params": jax.random.PRNGKey(seed)},
            batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
            batch.targets[:, :-1], 16, False,
        )
        target_len = int((batch.targets[0, 1:] != 40).sum())
        base = DeviceBeamSearcher(
            model, variables, compiled, dlm, DecodeConfig(
                BeamWidth=8, extra_steps=6), 16, max_steps=target_len + 6,
        )
        quant = DeviceBeamSearcher(
            model, variables, compiled, dlm, DecodeConfig(
                BeamWidth=8, extra_steps=6, quantize_int8=True),
            16, max_steps=target_len + 6,
        )
        b_hist, b_score, b_words = base.search(batch, target_len)
        q_hist, q_score, q_words = quant.search(batch, target_len)
        if not (np.isfinite(b_score) and np.isfinite(q_score)):
            continue
        total += 1
        assert q_score == pytest.approx(b_score, abs=0.5)
        if list(q_hist) == list(b_hist) and q_words == b_words:
            agree += 1
    assert total >= 2, "searches never finished; test setup too tight"
    assert agree >= total - 1, f"int8 beam diverged too often: {agree}/{total}"
