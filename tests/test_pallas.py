"""Pallas flash-attention kernel vs the XLA formulation (interpret mode on
CPU; the compiled path is exercised on real TPU hardware by bench/verify)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emg_tpu.ops.pallas.flash_attention import flash_attention_bias, masked_bias

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(11)


def test_flash_attention_matches_xla_interpret():
    B, H, T, Dh = 2, 2, 512, 32
    q = (RNG.normal(size=(B, H, T, Dh)) * 0.3).astype(np.float32)
    k = (RNG.normal(size=(B, H, T, Dh)) * 0.3).astype(np.float32)
    v = RNG.normal(size=(B, H, T, Dh)).astype(np.float32)
    rel = RNG.normal(size=(B, H, T, T)).astype(np.float32)
    kpad = np.zeros((B, T), bool)
    kpad[0, -100:] = True

    bias = masked_bias(jnp.asarray(rel), jnp.asarray(kpad), jnp.asarray(kpad), H)
    out = flash_attention_bias(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias, interpret=True
    )

    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(Dh)
    s = np.where(kpad[:, None, None, :], -1e8, s)
    s = np.where(kpad[:, None, :, None], -1e8, s)
    s = s + rel
    p = np.asarray(jax.nn.softmax(jnp.asarray(s), axis=-1))
    ref = np.einsum("bhqk,bhkd->bhqd", p, v)

    # compare valid (non-pad) query rows; padded rows' outputs are discarded
    for b in range(B):
        rows = ~kpad[b]
        np.testing.assert_allclose(
            np.asarray(out)[b][:, rows, :], ref[b][:, rows, :], rtol=2e-3, atol=2e-3
        )


def test_model_flash_flag_matches_xla():
    """EMGModel with use_flash_attention produces (near-)identical encoder
    outputs to the XLA path (interpret-mode pallas on CPU)."""
    from emg_tpu.config import ModelConfig
    from emg_tpu.models import EMGModel
    import emg_tpu.ops.pallas.flash_attention as fa

    from tests.test_train_step import toy_batch

    cfg_kw = dict(
        model_size=16, feed_forward_layer_size=32, num_layers_encoder=1,
        num_layers_decoder=1, n_heads_encoder=2, n_heads_decoder=2,
        relative_distance=8, dropout_model=0.0, dropout_pos_emb=0.0,
    )
    batch = toy_batch(B=2, n_rows=2, chunk=64 * 32, S=8, seed=31)  # T=256
    model_x = EMGModel(ModelConfig(**cfg_kw))
    variables = model_x.init(
        {"params": jax.random.PRNGKey(0)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 256, False,
    )
    mem_x, enc_x, _ = model_x.apply(
        variables, batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        256, train=False, method=model_x.encode,
    )
    # force the flash path in interpret mode on CPU
    orig_avail = fa.flash_available
    orig_fab = fa.flash_attention_bias
    fa.flash_available = lambda: True
    fa.flash_attention_bias = lambda q, k, v, bias, **kw: orig_fab(
        q, k, v, bias, interpret=True
    )
    try:
        model_f = EMGModel(ModelConfig(use_flash_attention=True, **cfg_kw))
        mem_f, enc_f, _ = model_f.apply(
            variables, batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
            256, train=False, method=model_f.encode,
        )
    finally:
        fa.flash_available = orig_avail
        fa.flash_attention_bias = orig_fab
    np.testing.assert_allclose(
        np.asarray(mem_x), np.asarray(mem_f), rtol=2e-3, atol=2e-3
    )
