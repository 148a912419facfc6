"""Stage-4 tests: model components vs torch oracles built from the same
formulas (shared weights, compared numerically), plus loss parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from emg_tpu.config import ModelConfig
from emg_tpu.models import (
    EMGModel,
    MaskedBatchNorm,
    MultiHeadAttention,
    relative_to_absolute,
)
from emg_tpu.models.model import _gather_utterances, _shift_rows
from emg_tpu.ops import ctc_loss, label_smoothing_loss

RNG = np.random.default_rng(7)


def small_cfg(**kw):
    d = dict(
        model_size=32,
        feed_forward_layer_size=64,
        num_layers_encoder=2,
        num_layers_decoder=2,
        n_heads_encoder=4,
        n_heads_decoder=4,
        relative_distance=16,
        dropout_model=0.0,
        dropout_pos_emb=0.0,
    )
    d.update(kw)
    return ModelConfig(**d)


# ---------------------------------------------------------------------------
# Relative positional indexing
# ---------------------------------------------------------------------------

def test_relative_to_absolute_against_naive():
    B, H, L = 2, 3, 7
    x = jnp.asarray(RNG.normal(size=(B, H, L, 2 * L - 1)), jnp.float32)
    out = np.asarray(relative_to_absolute(x))
    xn = np.asarray(x)
    for q in range(L):
        for k in range(L):
            np.testing.assert_allclose(
                out[:, :, q, k], xn[:, :, q, k - q + L - 1], rtol=1e-6
            )


@pytest.mark.slow
def test_relative_bias_range_masking():
    """Out-of-range relative positions (|k-q| >= maxpos) get -1e8."""
    from emg_tpu.models.attention import LearnedRelativePositionalBias

    L, H, Dh, maxpos = 10, 2, 4, 4
    mod = LearnedRelativePositionalBias(maxpos, H, Dh)
    q = jnp.asarray(RNG.normal(size=(1, H, L, Dh)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), q)
    out = np.asarray(mod.apply(params, q))
    for qi in range(L):
        for ki in range(L):
            if abs(ki - qi) >= maxpos:
                assert out[0, 0, qi, ki] < -1e7, (qi, ki)
            else:
                assert out[0, 0, qi, ki] > -1e6, (qi, ki)


# ---------------------------------------------------------------------------
# Multi-head attention vs torch einsum oracle
# ---------------------------------------------------------------------------

def _torch_mha(q_in, k_in, v_in, w_q, w_k, w_v, w_o, key_pad=None, query_pad=None, causal=False):
    """Oracle with the same einsum contract and -1e8 additive masking."""
    q = torch.einsum("btf,hfa->bhta", q_in, w_q)
    k = torch.einsum("btf,hfa->bhta", k_in, w_k)
    v = torch.einsum("btf,hfa->bhta", v_in, w_v)
    d = q.shape[-1]
    logits = torch.einsum("bhqa,bhka->bhqk", q, k) / (d ** 0.5)
    if causal:
        L = logits.shape[-1]
        cm = torch.tril(torch.ones(L, L, dtype=torch.bool))
        logits = logits.masked_fill(~cm, -1e8)
    if key_pad is not None:
        logits = logits.masked_fill(key_pad[:, None, None, :], -1e8)
    if query_pad is not None:
        logits = logits.masked_fill(query_pad[:, None, :, None], -1e8)
    probs = torch.softmax(logits, dim=-1)
    o = torch.einsum("bhqk,bhka->bhqa", probs, v)
    return torch.einsum("bhta,haf->btf", o, w_o)


@pytest.mark.slow
def test_mha_matches_torch_oracle():
    B, T, D, H = 2, 9, 16, 4
    mha = MultiHeadAttention(D, H, dropout=0.0, relative_positional=False)
    x = RNG.normal(size=(B, T, D)).astype(np.float32)
    params = mha.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))
    key_pad = np.zeros((B, T), bool)
    key_pad[0, -3:] = True
    ours = np.asarray(
        mha.apply(
            params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
            key_padding_mask=jnp.asarray(key_pad),
            query_padding_mask=jnp.asarray(key_pad),
            causal=True,
        )
    )
    p = params["params"]
    ref = _torch_mha(
        torch.tensor(x), torch.tensor(x), torch.tensor(x),
        torch.tensor(np.asarray(p["w_q"])), torch.tensor(np.asarray(p["w_k"])),
        torch.tensor(np.asarray(p["w_v"])), torch.tensor(np.asarray(p["w_o"])),
        key_pad=torch.tensor(key_pad), query_pad=torch.tensor(key_pad), causal=True,
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Masked BatchNorm vs torch BatchNorm1d
# ---------------------------------------------------------------------------

def test_masked_batchnorm_matches_torch():
    N, L, C = 6, 10, 5
    n_valid = 4
    x = RNG.normal(size=(N, L, C)).astype(np.float32)
    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), n_valid, False)
    out, updated = bn.apply(
        variables, jnp.asarray(x), n_valid, False, mutable=["batch_stats"]
    )
    tbn = torch.nn.BatchNorm1d(C)
    tx = torch.tensor(x[:n_valid]).permute(0, 2, 1)  # (N, C, L)
    tref = tbn(tx).permute(0, 2, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(out)[:n_valid], tref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-5,
    )
    # eval mode uses running stats
    out_eval = bn.apply(
        {"params": variables["params"], "batch_stats": updated["batch_stats"]},
        jnp.asarray(x), n_valid, True,
    )
    rm = updated["batch_stats"]["mean"]
    rv = updated["batch_stats"]["var"]
    expect = (x - np.asarray(rm)) / np.sqrt(np.asarray(rv) + 1e-5)
    np.testing.assert_allclose(np.asarray(out_eval), expect, rtol=1e-4, atol=1e-5)


def test_masked_batchnorm_large_mean_channels():
    """Channels with |mean| >> std must not catastrophically cancel in the
    one-pass variance (E[x^2]-E[x]^2 in f32 loses ~all of var when
    mean^2/var exceeds f32's 2^-24): the mean-shifted form stays at torch
    BatchNorm1d accuracy (ADVICE r3, models/resnet.py)."""
    N, L, C = 6, 10, 4
    n_valid = 5
    x = RNG.normal(size=(N, L, C)).astype(np.float32)
    x = x * 0.1 + np.asarray([1000.0, -500.0, 250.0, 0.0], np.float32)
    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), n_valid, False)
    out, updated = bn.apply(
        variables, jnp.asarray(x), n_valid, False, mutable=["batch_stats"]
    )
    tbn = torch.nn.BatchNorm1d(C)
    tx = torch.tensor(x[:n_valid]).permute(0, 2, 1)
    tref = tbn(tx).permute(0, 2, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(out)[:n_valid], tref,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-3, atol=1e-5,
    )


# ---------------------------------------------------------------------------
# Conv stack vs torch oracle
# ---------------------------------------------------------------------------

def _torch_resblock(x, p, stride):
    """x: (N, C_in, L); p: flax param dict for one ResBlock."""

    def conv(x, w, b, stride=1, pad=1):
        w = torch.tensor(np.asarray(w)).permute(2, 1, 0)  # (k,in,out)->(out,in,k)
        return F.conv1d(x, w, torch.tensor(np.asarray(b)), stride=stride, padding=pad)

    def bn(x, scale, bias, mean, var):
        # normalize with the *batch* statistics like train-mode BN
        m = x.mean(dim=(0, 2), keepdim=True)
        v = x.var(dim=(0, 2), unbiased=False, keepdim=True)
        xh = (x - m) / torch.sqrt(v + 1e-5)
        return xh * torch.tensor(np.asarray(scale))[None, :, None] + torch.tensor(
            np.asarray(bias)
        )[None, :, None]

    h = conv(x, p["conv1"]["kernel"], p["conv1"]["bias"], stride=stride)
    h = bn(h, p["bn1"]["scale"], p["bn1"]["bias"], None, None)
    h = F.relu(h)
    h = conv(h, p["conv2"]["kernel"], p["conv2"]["bias"])
    h = bn(h, p["bn2"]["scale"], p["bn2"]["bias"], None, None)
    res = conv(x, p["residual_path"]["kernel"], p["residual_path"]["bias"], stride=stride, pad=0)
    res = bn(res, p["res_norm"]["scale"], p["res_norm"]["bias"], None, None)
    return F.relu(h + res)


@pytest.mark.slow
def test_resblock_matches_torch():
    from emg_tpu.models.resnet import ResBlock

    N, L, C_in, C_out = 4, 32, 8, 12
    x = RNG.normal(size=(N, L, C_in)).astype(np.float32)
    block = ResBlock(C_out, stride=2)
    variables = block.init(jax.random.PRNGKey(1), jnp.asarray(x), N, False)
    ours, _ = block.apply(variables, jnp.asarray(x), N, False, mutable=["batch_stats"])
    ref = _torch_resblock(
        torch.tensor(x).permute(0, 2, 1), variables["params"], 2
    ).permute(0, 2, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Gather-based decollate + shift augmentation
# ---------------------------------------------------------------------------

def test_gather_utterances():
    flat = jnp.asarray(RNG.normal(size=(20, 3)), jnp.float32)
    offsets = jnp.asarray([0, 7], jnp.int32)
    lengths = jnp.asarray([7, 5], jnp.int32)
    out, pad_mask = _gather_utterances(flat, offsets, lengths, 8)
    assert out.shape == (2, 8, 3)
    np.testing.assert_allclose(np.asarray(out)[0, :7], np.asarray(flat)[0:7])
    np.testing.assert_allclose(np.asarray(out)[1, :5], np.asarray(flat)[7:12])
    np.testing.assert_allclose(np.asarray(out)[0, 7:], 0.0)
    assert np.asarray(pad_mask)[0].tolist() == [False] * 7 + [True]


def test_shift_rows():
    x = jnp.asarray(np.arange(24).reshape(1, 24, 1), jnp.float32)
    y = np.asarray(_shift_rows(x, 5))
    np.testing.assert_allclose(y[0, :19, 0], np.arange(5, 24))
    np.testing.assert_allclose(y[0, 19:, 0], 0.0)


# ---------------------------------------------------------------------------
# Full model forward
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_model_forward_shapes():
    cfg = small_cfg()
    model = EMGModel(cfg)
    N, chunk, C = 4, 64, 8
    B, S, T = 2, 6, 16
    packed = jnp.asarray(RNG.normal(size=(N, chunk, C)), jnp.float32)
    offsets = jnp.asarray([0, 10], jnp.int32)
    lengths = jnp.asarray([10, 12], jnp.int32)
    y = jnp.asarray(RNG.integers(0, 40, size=(B, S)))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        packed, 3, offsets, lengths, y, T, False,
    )
    enc_logits, dec_logits = model.apply(
        variables, packed, 3, offsets, lengths, y, T, False,
    )
    assert enc_logits.shape == (B, T, 44)
    assert dec_logits.shape == (B, S, 43)
    # train mode with dropout + shift rngs and mutable batch stats
    (enc2, dec2), _ = model.apply(
        variables, packed, 3, offsets, lengths, y, T, True,
        rngs={"dropout": jax.random.PRNGKey(1), "shift": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(enc2)).all()


@pytest.mark.slow
def test_pad_embedding_row_is_zero():
    cfg = small_cfg()
    model = EMGModel(cfg)
    N, chunk = 2, 64
    packed = jnp.zeros((N, chunk, 8), jnp.float32)
    y = jnp.asarray([[41, 5, 42, 42]])
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        packed, 2, jnp.asarray([0]), jnp.asarray([10]), y, 16, False,
    )

    def loss_fn(params):
        _, dec = model.apply(
            {**variables, "params": params},
            packed, 2, jnp.asarray([0]), jnp.asarray([10]), y, 16, False,
        )
        return jnp.sum(jnp.exp(dec))

    grads = jax.grad(loss_fn)(variables["params"])
    emb_grad = np.asarray(grads["embedding_tgt"]["embedding"])
    np.testing.assert_allclose(emb_grad[42], 0.0)  # PAD row frozen
    assert np.abs(emb_grad[5]).sum() > 0


@pytest.mark.slow
def test_conformer_encoder_variant():
    cfg = small_cfg(encoder_kind="conformer", conformer_conv_kernel_size=7)
    model = EMGModel(cfg)
    packed = jnp.asarray(RNG.normal(size=(2, 64, 8)), jnp.float32)
    y = jnp.asarray([[41, 3, 4]])
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        packed, 2, jnp.asarray([0]), jnp.asarray([12]), y, 16, False,
    )
    enc_logits, dec_logits = model.apply(
        variables, packed, 2, jnp.asarray([0]), jnp.asarray([12]), y, 16, False
    )
    assert enc_logits.shape == (1, 16, 44)
    assert np.isfinite(np.asarray(enc_logits)).all()


# ---------------------------------------------------------------------------
# Losses vs torch
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_ctc_matches_torch():
    B, T, C, S = 3, 20, 44, 7
    logits = RNG.normal(size=(B, T, C)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    input_lengths = np.array([20, 15, 12])
    targets = RNG.integers(0, 40, size=(B, S))
    target_lengths = np.array([7, 5, 4])
    ours = float(
        ctc_loss(
            jnp.asarray(log_probs), jnp.asarray(input_lengths),
            jnp.asarray(targets), jnp.asarray(target_lengths), blank=43,
        )
    )
    ref = F.ctc_loss(
        torch.tensor(log_probs).permute(1, 0, 2),
        torch.tensor(targets),
        torch.tensor(input_lengths),
        torch.tensor(target_lengths),
        blank=43,
        reduction="mean",
    ).item()
    assert ours == pytest.approx(ref, rel=1e-4)


@pytest.mark.slow
def test_ctc_with_bucket_padding_matches_unpadded():
    B, T, C, S = 2, 16, 44, 6
    logits = RNG.normal(size=(B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    input_lengths = np.array([16, 10])
    targets = RNG.integers(0, 40, size=(B, S))
    target_lengths = np.array([6, 3])
    base = float(ctc_loss(jnp.asarray(lp), jnp.asarray(input_lengths),
                          jnp.asarray(targets), jnp.asarray(target_lengths), blank=43))
    # pad with a fake example and mask it out
    lp_p = np.concatenate([lp, np.zeros((1, T, C), np.float32)], axis=0)
    il_p = np.array([16, 10, 1])
    tg_p = np.concatenate([targets, np.zeros((1, S), np.int64)], axis=0)
    tl_p = np.array([6, 3, 0])
    masked = float(
        ctc_loss(
            jnp.asarray(lp_p), jnp.asarray(il_p), jnp.asarray(tg_p),
            jnp.asarray(tl_p), blank=43,
            batch_mask=jnp.asarray([True, True, False]),
        )
    )
    assert masked == pytest.approx(base, rel=1e-5)


def test_label_smoothing_matches_torch():
    B, S, C = 2, 5, 43
    logits = RNG.normal(size=(B, S, C)).astype(np.float32)
    targets = RNG.integers(0, 40, size=(B, S))
    targets[0, -2:] = 42  # PAD
    ours = float(label_smoothing_loss(jnp.asarray(logits), jnp.asarray(targets), 0.1))
    # reference formula: (1-eps)*CE(ignore_index=42) on (B,C,S) + eps/S*sum(exp)
    t_in = torch.tensor(logits).permute(0, 2, 1)
    ce = torch.nn.CrossEntropyLoss(ignore_index=42)(t_in, torch.tensor(targets))
    ref = (0.9 * ce + (0.1 / t_in.shape[2]) * torch.sum(torch.exp(t_in))).item()
    assert ours == pytest.approx(ref, rel=1e-4)


@pytest.mark.slow
def test_label_smoothing_bucket_padding_invariance():
    B, S, C = 2, 5, 43
    logits = RNG.normal(size=(B, S, C)).astype(np.float32)
    targets = RNG.integers(0, 40, size=(B, S))
    base = float(label_smoothing_loss(jnp.asarray(logits), jnp.asarray(targets), 0.1))
    # bucket-pad S 5->8 and B 2->3
    lp = np.zeros((3, 8, C), np.float32)
    lp[:B, :S] = logits
    tg = np.full((3, 8), 42, np.int64)
    tg[:B, :S] = targets
    padded = float(
        label_smoothing_loss(
            jnp.asarray(lp), jnp.asarray(tg), 0.1,
            batch_mask=jnp.asarray([True, True, False]), seq_len=S,
        )
    )
    assert padded == pytest.approx(base, rel=1e-5)


@pytest.mark.slow
def test_ctc_reduction_dispatch():
    """'sum' and invalid reductions behave correctly with a batch mask."""
    B, T, C, S = 2, 10, 44, 4
    rng = np.random.default_rng(0)
    lp = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32), axis=-1))
    tg = rng.integers(0, 40, size=(B, S))
    il = np.array([10, 8]); tl = np.array([4, 3])
    mask = jnp.asarray([True, False])
    s_masked = float(ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(tg),
                              jnp.asarray(tl), blank=43, reduction="sum",
                              batch_mask=mask))
    per = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(tg),
                              jnp.asarray(tl), blank=43, reduction="none"))
    assert s_masked == pytest.approx(per[0], rel=1e-5)
    with pytest.raises(ValueError):
        ctc_loss(jnp.asarray(lp), jnp.asarray(il), jnp.asarray(tg),
                 jnp.asarray(tl), blank=43, reduction="typo")
