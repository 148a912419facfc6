"""Multi-host (DCN) training support.

The reference is single-GPU (its nn.DataParallel wrapper at
recognition_model.py:284 is vestigial); here scaling past one host follows
the standard JAX multi-controller recipe: every host runs the same program,
``jax.distributed.initialize`` wires the processes together over DCN, the
``(data, model)`` mesh spans the GLOBAL device set, and each host feeds the
process-local shard of every batch with
``jax.make_array_from_process_local_data``. Inside ``jit`` nothing changes:
the training step stays written in global view and XLA keeps gradient
reductions on ICI within a slice, crossing DCN only for the data-parallel
psum between slices.

Single-process runs are the degenerate case throughout: ``process_count()``
is 1, every "local shard" is the whole batch, and the helpers reduce to
plain ``device_put`` — so the exact code path unit-tests on one host.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np

log = logging.getLogger(__name__)


def initialize_distributed(pcfg) -> bool:
    """Initialize JAX's multi-controller runtime from ParallelConfig.

    Activates only when ``--parallel.coordinator_address`` is set (e.g.
    "10.0.0.1:8476"). ``num_processes``/``process_id`` default to -1 =
    "discover from the cluster environment" (TPU pods populate these via
    the runtime; on other clusters pass them explicitly). Returns True if
    distributed mode was initialized. Must run before the first backend
    touch — the Trainer calls it ahead of building the mesh.
    """
    addr = getattr(pcfg, "coordinator_address", "")
    if not addr:
        return False
    kwargs = {"coordinator_address": addr}
    if getattr(pcfg, "num_processes", -1) != -1:
        kwargs["num_processes"] = pcfg.num_processes
    if getattr(pcfg, "process_id", -1) != -1:
        kwargs["process_id"] = pcfg.process_id
    jax.distributed.initialize(**kwargs)
    log.info(
        "distributed runtime up: process %d/%d, %d global / %d local devices",
        jax.process_index(), jax.process_count(),
        len(jax.devices()), len(jax.local_devices()),
    )
    return True


def is_primary() -> bool:
    """True on the process that owns host-side side effects (metrics files,
    TensorBoard events, log lines). Checkpoint saves go through orbax,
    which coordinates across processes itself."""
    return jax.process_index() == 0


def process_local_rows(n_rows: int) -> slice:
    """The slice of a leading (data-parallel) batch axis this process must
    provide. Batches shard row-major over the ``data`` mesh axis, and mesh
    construction orders devices process-major, so each process owns one
    contiguous row block."""
    pc = jax.process_count()
    assert n_rows % pc == 0, (
        f"global batch of {n_rows} rows must divide over {pc} processes"
    )
    per = n_rows // pc
    pi = jax.process_index()
    return slice(pi * per, (pi + 1) * per)


def make_global_batch(batch, mesh, specs) -> object:
    """Assemble a globally-sharded PackedBatch from process-local numpy data.

    ``batch`` holds this process's rows for every leading-``data``-sharded
    field and the full (replicated) value for the rest; ``specs`` maps field
    name -> PartitionSpec exactly as in ``parallel.mesh.batch_pspec``. With
    one process this is equivalent to ``shard_batch`` (device_put of the
    whole batch).
    """
    from jax.sharding import NamedSharding

    from emg_tpu.data.batching import PackedBatch

    def place(name, value):
        sharding = NamedSharding(mesh, specs[name])
        value = np.asarray(value)
        if jax.process_count() == 1:
            return jax.device_put(value, sharding)
        return jax.make_array_from_process_local_data(sharding, value)

    return PackedBatch(**{
        name: place(name, getattr(batch, name)) for name in specs
    })
