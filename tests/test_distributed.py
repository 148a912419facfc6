"""Multi-host (DCN) support: jax.distributed wiring and process-local batch
assembly (emg_tpu/parallel/distributed.py). Real multi-process runs need a
cluster; these tests pin the single-process degenerate case (which shares
every code path) and the initialize() argument contract."""

import numpy as np
import pytest

import jax

from emg_tpu.config import Config
from emg_tpu.parallel.distributed import (
    initialize_distributed,
    is_primary,
    make_global_batch,
    process_local_rows,
)
from emg_tpu.parallel.mesh import batch_pspec, make_mesh, shard_batch


def _packed_batch(B=8, rows=8):
    from emg_tpu.data.batching import PackedBatch

    rng = np.random.default_rng(0)
    return PackedBatch(
        packed_raw=rng.normal(size=(rows, 64, 8)).astype(np.float32),
        n_rows=np.int32(rows),
        lengths=np.full(B, 8, np.int32),
        offsets=(np.arange(B) * 8).astype(np.int32),
        targets=np.full((B, 6), 42, np.int64),
        target_lengths=np.full(B, 6, np.int32),
        n_examples=np.int32(B),
    )


def test_initialize_noop_without_coordinator():
    cfg = Config()
    assert cfg.parallel.coordinator_address == ""
    assert initialize_distributed(cfg.parallel) is False


def test_initialize_passes_cluster_args(monkeypatch):
    calls = {}

    def fake_init(**kwargs):
        calls.update(kwargs)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    cfg = Config()
    cfg.parallel.coordinator_address = "10.0.0.1:8476"
    cfg.parallel.num_processes = 4
    cfg.parallel.process_id = 2
    assert initialize_distributed(cfg.parallel) is True
    assert calls == {
        "coordinator_address": "10.0.0.1:8476",
        "num_processes": 4,
        "process_id": 2,
    }

    # -1 means "discover from the cluster environment": omit the kwargs
    calls.clear()
    cfg.parallel.num_processes = -1
    cfg.parallel.process_id = -1
    initialize_distributed(cfg.parallel)
    assert calls == {"coordinator_address": "10.0.0.1:8476"}


def test_single_process_degenerate_case():
    assert jax.process_count() == 1
    assert is_primary()
    assert process_local_rows(8) == slice(0, 8)


def test_make_global_batch_matches_shard_batch():
    """With one process, make_global_batch must equal the device_put path
    (same shardings, same values) — the exact arrays multi-host runs feed."""
    mesh = make_mesh(4, 2)
    batch = _packed_batch()
    a = shard_batch(batch, mesh)
    b = make_global_batch(batch, mesh, batch_pspec())
    for name in batch_pspec():
        va, vb = getattr(a, name), getattr(b, name)
        assert va.sharding == vb.sharding, name
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_process_local_rows_requires_divisibility(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert process_local_rows(8) == slice(2, 4)
    with pytest.raises(AssertionError):
        process_local_rows(6)
