"""Fused decoder token-step kernels vs the XLA decode_step (interpret mode).

The fused path (ops/pallas/fused_decode_step.py) must reproduce
EMGModel.decode_step — embedding/PE, per-layer self+cross attention with
the in-register current-token splice, FFN, LayerNorms, cache writes, and
the float32 head — since the device beam swaps it in wholesale on TPU
(decode/device_beam.py). The beam's usage pattern is mirrored: the
encoder memory of ONE utterance is shared across all rows (cross K/V
leading dim 1) and the beam's per-step cache row re-ordering runs through
FusedDecoder.select_rows against the XLA gather."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emg_tpu.config import ModelConfig
from emg_tpu.models import EMGModel
from emg_tpu.ops.pallas.fused_decode_step import FusedDecoder

from tests.test_train_step import toy_batch


@pytest.mark.parametrize("compute_dtype", [
    pytest.param("float32", marks=pytest.mark.slow),  # smoke keeps the
    "bfloat16",  # serving-default dtype; f32 runs in the slow tier
])
def test_fused_step_matches_decode_step(compute_dtype):
    cfg = ModelConfig(
        model_size=16, feed_forward_layer_size=32,
        num_layers_encoder=1, num_layers_decoder=2,
        n_heads_encoder=2, n_heads_decoder=2, relative_distance=8,
        dropout_model=0.0, dropout_pos_emb=0.0, compute_dtype=compute_dtype,
    )
    model = EMGModel(cfg)
    batch = toy_batch(B=4, n_rows=2, chunk=64, S=10, seed=11)
    variables = model.init(
        {"params": jax.random.PRNGKey(11)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    memory, _, src_mask = model.apply(
        variables, batch.packed_raw, batch.n_rows, batch.offsets,
        batch.lengths, 16, False, method=model.encode,
    )
    # the beam layout: ONE utterance's memory shared across all rows
    memory, src_mask = memory[:1], src_mask[:1]
    cross_kvs = model.apply(variables, memory, method=model.project_cross_kvs)

    B, S = 4, 8
    tokens = np.asarray(batch.targets[:, :S], np.int32)
    tokens[2, 3:] = 42  # a row that hits PAD mid-decode
    tokens = jnp.asarray(tokens)

    caches_ref = model.init_decode_cache(B, S)
    fused = FusedDecoder(cfg, variables)
    caches_fused = fused.init_cache(B, S)

    rng = np.random.default_rng(3)

    # f32 pins the math tight; bf16 allows the residual rounding noise of
    # interpret-mode bf16 vs XLA bf16 einsums accumulated over the layers
    # (the kernels mirror the XLA path's stream-dtype rounding points, but
    # the two backends round bf16 contractions differently)
    rtol = 3e-2 if compute_dtype == "bfloat16" else 2e-5
    atol = 3e-2 if compute_dtype == "bfloat16" else 1e-4
    for t in range(S - 1):
        tok = tokens[:, t]
        ref_logits, caches_ref = model.apply(
            variables, tok, t, caches_ref, cross_kvs, tokens, src_mask,
            method=model.decode_step,
        )
        fused_logits, caches_fused = fused.step(
            tok, t, caches_fused, cross_kvs, tokens, src_mask,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(fused_logits), np.asarray(ref_logits),
            rtol=rtol, atol=atol, err_msg=f"step {t}",
        )
        # what decoding consumes: the greedy token choice must agree
        np.testing.assert_array_equal(
            np.argmax(np.asarray(fused_logits), axis=-1),
            np.argmax(np.asarray(ref_logits), axis=-1),
            err_msg=f"argmax step {t}",
        )
        if t == 3:
            # mid-search beam re-ordering: duplicate/permute rows the way
            # device_beam's cache_sel does, through both cache layouts
            sel = jnp.asarray(rng.integers(0, B, size=B), jnp.int32)
            caches_ref = jax.tree.map(lambda c: c[:, sel], caches_ref)
            caches_fused = FusedDecoder.select_rows(caches_fused, sel)
            tokens = tokens[sel]

    # caches agree too (both layouts store the same new K/V rows):
    # ref (L, B, H, S, Dh) -> fused k (L, H, S, B, Dh), v (L, H, Dh, S, B)
    ref_k = np.transpose(np.asarray(caches_ref[0], np.float32), (0, 2, 3, 1, 4))
    ref_v = np.transpose(np.asarray(caches_ref[1], np.float32), (0, 2, 4, 3, 1))
    np.testing.assert_allclose(
        np.asarray(caches_fused[0], np.float32), ref_k, rtol=rtol, atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(caches_fused[1], np.float32), ref_v, rtol=rtol, atol=atol
    )


@pytest.mark.slow
def test_fused_step_int8_matches_xla_int8():
    """With utils/quantize int8 weights, the fused kernels dequantize
    IN-KERNEL with the exact Int8Tensor formula, so the fused and XLA
    steps see bit-identical weights — logits agree as tightly as the
    unquantized float32 case."""
    from emg_tpu.utils.quantize import quantize_decoder_int8

    cfg = ModelConfig(
        model_size=16, feed_forward_layer_size=32,
        num_layers_encoder=1, num_layers_decoder=2,
        n_heads_encoder=2, n_heads_decoder=2, relative_distance=8,
        dropout_model=0.0, dropout_pos_emb=0.0, compute_dtype="float32",
    )
    model = EMGModel(cfg)
    batch = toy_batch(B=4, n_rows=2, chunk=64, S=10, seed=13)
    variables = model.init(
        {"params": jax.random.PRNGKey(13)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    qvars = quantize_decoder_int8(variables, dequant_dtype=jnp.float32)
    memory, _, src_mask = model.apply(
        variables, batch.packed_raw, batch.n_rows, batch.offsets,
        batch.lengths, 16, False, method=model.encode,
    )
    memory, src_mask = memory[:1], src_mask[:1]
    cross_kvs = model.apply(qvars, memory, method=model.project_cross_kvs)

    B, S = 4, 6
    tokens = jnp.asarray(np.asarray(batch.targets[:, :S], np.int32))
    caches_ref = model.init_decode_cache(B, S)
    fused = FusedDecoder(cfg, qvars, interpret=True)
    caches_fused = fused.init_cache(B, S)
    for t in range(S - 1):
        tok = tokens[:, t]
        ref_logits, caches_ref = model.apply(
            qvars, tok, t, caches_ref, cross_kvs, tokens, src_mask,
            method=model.decode_step,
        )
        fused_logits, caches_fused = fused.step(
            tok, t, caches_fused, cross_kvs, tokens, src_mask,
        )
        np.testing.assert_allclose(
            np.asarray(fused_logits), np.asarray(ref_logits),
            rtol=2e-5, atol=1e-4, err_msg=f"step {t}",
        )


@pytest.mark.slow
def test_fused_step_under_vmap():
    """search_many / the continuous server run the step under vmap (pallas
    prepends a grid dim); each lane must reproduce the unbatched step."""
    cfg = ModelConfig(
        model_size=16, feed_forward_layer_size=32,
        num_layers_encoder=1, num_layers_decoder=2,
        n_heads_encoder=2, n_heads_decoder=2, relative_distance=8,
        dropout_model=0.0, dropout_pos_emb=0.0, compute_dtype="float32",
    )
    model = EMGModel(cfg)
    batch = toy_batch(B=2, n_rows=2, chunk=64, S=10, seed=3)
    variables = model.init(
        {"params": jax.random.PRNGKey(3)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    memory, _, src_mask = model.apply(
        variables, batch.packed_raw, batch.n_rows, batch.offsets,
        batch.lengths, 16, False, method=model.encode,
    )
    memory, src_mask = memory[:1], src_mask[:1]
    cross_kvs = model.apply(variables, memory, method=model.project_cross_kvs)
    fused = FusedDecoder(cfg, variables, interpret=True)

    B, S = 2, 6
    tokens = jnp.asarray(np.asarray(batch.targets[:, :S], np.int32))
    caches = fused.init_cache(B, S)
    tok = tokens[:, 0]
    lg0, _ = fused.step(tok, 0, caches, cross_kvs, tokens, src_mask)
    two = lambda x: jnp.stack([x, x])
    lgv, _ = jax.vmap(fused.step)(
        two(tok), jnp.zeros((2,), jnp.int32), jax.tree.map(two, caches),
        jax.tree.map(two, cross_kvs), two(tokens), two(src_mask),
    )
    for lane in range(2):
        np.testing.assert_allclose(np.asarray(lgv[lane]), np.asarray(lg0),
                                   rtol=1e-6, atol=1e-6)


def test_ffn_block_chunked_matches_monolithic():
    """The FF-dim grid walk (VMEM fit at flagship FF=3072) is exact:
    chunked and single-block runs agree to f32 accumulation order."""
    from emg_tpu.ops.pallas.fused_decode_step import ffn_block

    rng = np.random.default_rng(0)
    B, D, FF = 4, 16, 32
    x2 = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D, FF)), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(1, FF)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(FF, D)), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(1, D)), jnp.float32)
    ln3 = jnp.asarray(rng.normal(size=(2, D)), jnp.float32)
    mono = ffn_block(x2, w1, b1, w2, b2, ln3, interpret=True, ff_block=FF)
    chunk = ffn_block(x2, w1, b1, w2, b2, ln3, interpret=True, ff_block=8)
    np.testing.assert_allclose(np.asarray(chunk), np.asarray(mono),
                               rtol=1e-6, atol=1e-6)


def test_fused_greedy_matches_xla():
    """The per-row-memory fused path (greedy_decode_cached fused=...)
    returns the exact accuracy matrix of the XLA decode_step path."""
    from emg_tpu.decode.greedy import greedy_decode_cached

    cfg = ModelConfig(
        model_size=16, feed_forward_layer_size=32,
        num_layers_encoder=1, num_layers_decoder=2,
        n_heads_encoder=2, n_heads_decoder=2, relative_distance=8,
        dropout_model=0.0, dropout_pos_emb=0.0, compute_dtype="float32",
    )
    model = EMGModel(cfg)
    batch = toy_batch(B=4, n_rows=2, chunk=64, S=10, seed=5)
    variables = model.init(
        {"params": jax.random.PRNGKey(5)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    ref_out, ref_raw = greedy_decode_cached(model, variables, batch, 16, 9)
    fused = FusedDecoder(cfg, variables, interpret=True)
    got_out, got_raw = greedy_decode_cached(model, variables, batch, 16, 9,
                                            fused=fused)
    np.testing.assert_array_equal(np.asarray(got_out), np.asarray(ref_out))
    np.testing.assert_array_equal(np.asarray(got_raw), np.asarray(ref_raw))
