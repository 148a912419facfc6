"""Stage-6 tests: device greedy decoder vs a step-by-step host oracle."""

import numpy as np

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
