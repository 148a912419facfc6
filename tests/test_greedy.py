"""Stage-6 tests: device greedy decoder vs a step-by-step host oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emg_tpu.config import ModelConfig
from emg_tpu.decode import greedy_decode, run_greedy
from emg_tpu.models import EMGModel
from emg_tpu.text.phonemes import END_ID, PAD_ID, START_ID

from tests.test_train_step import tiny_model, toy_batch


def _host_greedy_oracle(model, variables, batch, max_frames, max_steps):
    """Step-by-step re-decode growing the prefix one token at a time, the
    way the reference loops (full-prefix re-run, python-side stop logic)."""
    memory, _, src_mask = model.apply(
        variables, batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        max_frames, train=False, method=model.encode,
    )
    B = memory.shape[0]
    S = max_steps + 1
    seqs = [[START_ID] for _ in range(B)]  # visible (frozen at </S>) output
    chain = [[START_ID] for _ in range(B)]  # raw argmax chain fed back in
    for s in range(1, S):
        tok = np.full((B, S), PAD_ID, np.int32)
        for b in range(B):
            tok[b, : len(chain[b])] = chain[b]
        logits = model.apply(
            variables, jnp.asarray(tok), memory, src_mask, False, method=model.decode
        )
        pred = np.asarray(jnp.argmax(logits[:, s - 1, :], axis=-1))
        for b in range(B):
            chain[b].append(int(pred[b]))
            if seqs[b][-1] != END_ID:
                seqs[b].append(int(pred[b]))
        if all(END_ID in s_ for s_ in seqs):
            break
    mat = np.full((B, S), PAD_ID, np.int32)
    for b in range(B):
        mat[b, : len(seqs[b])] = seqs[b]
    return mat


@pytest.mark.slow
def test_greedy_matches_host_oracle():
    model = tiny_model()
    batch = toy_batch(B=2, n_rows=2, chunk=64, S=8, seed=5)
    variables = model.init(
        {"params": jax.random.PRNGKey(1)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    max_steps = batch.targets.shape[1] - 1
    out, raw = greedy_decode(model, variables, batch, 16, max_steps)
    ref = _host_greedy_oracle(model, variables, batch, 16, max_steps)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_greedy_output_structure():
    model = tiny_model()
    batch = toy_batch(B=2, n_rows=2, chunk=64, S=8, seed=9)
    variables = model.init(
        {"params": jax.random.PRNGKey(2)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    strings, mat = run_greedy(model, variables, batch, 16, batch.targets.shape[1] - 1)
    assert len(strings) == 2
    assert all(s.startswith("<S>") for s in strings)
    assert mat.shape == (2, batch.targets.shape[1])
    # after the first </S> everything is PAD
    for row in mat:
        ends = np.where(row == END_ID)[0]
        if len(ends):
            assert (row[ends[0] + 1 :] == PAD_ID).all()


@pytest.mark.slow
def test_cached_greedy_matches_full():
    """KV-cached incremental decode must reproduce the full-prefix decode
    bit-for-bit (same argmax chain, same output matrix)."""
    from emg_tpu.decode.greedy import greedy_decode_cached

    model = tiny_model()
    batch = toy_batch(B=3, n_rows=2, chunk=64, S=10, seed=21)
    variables = model.init(
        {"params": jax.random.PRNGKey(7)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    max_steps = batch.targets.shape[1] - 1
    full_out, full_raw = greedy_decode(model, variables, batch, 16, max_steps)
    cached_out, cached_raw = greedy_decode_cached(model, variables, batch, 16, max_steps)
    np.testing.assert_array_equal(np.asarray(full_out), np.asarray(cached_out))
    np.testing.assert_array_equal(np.asarray(full_raw), np.asarray(cached_raw))


@pytest.mark.slow
def test_shared_memory_decode_matches_plain():
    """decode(..., cross_kvs) (the beam fast path) must match decode with
    the memory broadcast per hypothesis."""
    import jax.numpy as jnp

    model = tiny_model()
    batch = toy_batch(B=1, n_rows=2, chunk=64, S=8, seed=23)
    variables = model.init(
        {"params": jax.random.PRNGKey(9)},
        batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        batch.targets[:, :-1], 16, False,
    )
    memory, _, src_mask = model.apply(
        variables, batch.packed_raw, batch.n_rows, batch.offsets, batch.lengths,
        16, train=False, method=model.encode,
    )
    H = 5
    tokens = np.full((H, 6), 42, np.int32)
    tokens[:, 0] = 41
    tokens[:, 1] = np.arange(H)
    mem_b = jnp.broadcast_to(memory, (H,) + memory.shape[1:])
    mask_b = jnp.broadcast_to(src_mask, (H,) + src_mask.shape[1:])
    plain = model.apply(variables, jnp.asarray(tokens), mem_b, mask_b, False,
                        method=model.decode)
    cross_kvs = model.apply(variables, memory, method=model.project_cross_kvs)
    shared = model.apply(variables, jnp.asarray(tokens), None, src_mask, False,
                         cross_kvs, method=model.decode)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(shared), rtol=1e-5, atol=1e-5)
