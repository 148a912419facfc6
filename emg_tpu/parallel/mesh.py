"""Device mesh construction and sharding rules.

The reference trains on a single GPU with a vestigial nn.DataParallel wrapper
(recognition_model.py:284; SURVEY.md §2.3). Here parallelism is first-class:
a (data, model) jax.sharding.Mesh, batch arrays sharded over ``data``,
attention-head and feed-forward-hidden parameter dims sharded over ``model``.
The training step is written in global view under jit; XLA inserts the
gradient psums and any resharding collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_axis: int = -1, model_axis: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis == -1:
        data_axis = n // model_axis
    assert data_axis * model_axis == n, (
        f"mesh {data_axis}x{model_axis} does not cover {n} devices"
    )
    arr = np.array(devices).reshape(data_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def mesh_from_config(pcfg, devices: Optional[Sequence] = None) -> Optional[Mesh]:
    """Build the training mesh from a ParallelConfig, or None.

    Parallelism activates when the user sets any mesh axis explicitly
    (``--parallel.data_axis`` / ``--parallel.model_axis``); the defaults
    (-1, 1) keep the single-device path. ``data_axis=-1`` with an explicit
    ``model_axis`` spans all remaining devices.
    """
    if pcfg.data_axis == -1 and pcfg.model_axis == 1:
        return None
    mesh = make_mesh(pcfg.data_axis, pcfg.model_axis, devices)
    if mesh.devices.size == 1:
        return None
    return mesh


def shard_batch(batch, mesh: Mesh):
    """Place a PackedBatch on the mesh per batch_pspec (leading dim = data).

    Under a multi-host (DCN) runtime every process builds the same global
    batch; each contributes only its process-local block of the
    data-sharded leading dims (mesh device order is process-major, so the
    blocks are contiguous) and the globally-sharded arrays are assembled
    with jax.make_array_from_process_local_data."""
    specs = batch_pspec()
    from emg_tpu.data.batching import PackedBatch

    if jax.process_count() > 1:
        from emg_tpu.parallel.distributed import (
            make_global_batch,
            process_local_rows,
        )

        local = {}
        for name, spec in specs.items():
            v = np.asarray(getattr(batch, name))
            if len(spec) > 0 and spec[0] == "data":
                v = v[process_local_rows(v.shape[0])]
            local[name] = v
        return make_global_batch(PackedBatch(**local), mesh, specs)

    def place(name, value):
        return jax.device_put(value, NamedSharding(mesh, specs[name]))

    return PackedBatch(**{
        name: place(name, getattr(batch, name)) for name in specs
    })


def batch_pspec() -> dict:
    """PartitionSpecs for a PackedBatch's array fields (leading dim = data)."""
    return {
        "packed_raw": P("data", None, None),
        "n_rows": P(),
        "lengths": P("data"),
        "offsets": P("data"),
        "targets": P("data", None),
        "target_lengths": P("data"),
        "n_examples": P(),
    }


def param_pspec(path: tuple, leaf) -> P:
    """Tensor-parallel sharding rules for EMGModel parameters.

    - attention projections (H, D, Dh) / (H, Dh, D): shard heads over model
    - feed-forward linear1 kernel (D, FF): shard FF dim; linear2 (FF, D):
      shard its input dim (contracting) so the pair forms the standard
      column/row-parallel megatron layout with one psum per FF block
    - everything else replicated
    """
    names = [str(p) for p in path]
    flat = "/".join(names)
    if names and names[-1] in ("w_q", "w_k", "w_v", "w_o"):
        return P("model", None, None)
    if "linear1" in flat and names[-1] == "kernel":
        return P(None, "model")
    if "linear1" in flat and names[-1] == "bias":
        return P("model")
    if "linear2" in flat and names[-1] == "kernel":
        return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """Apply param_pspec rules, producing device-sharded params."""

    def place(path, leaf):
        spec = param_pspec(tuple(k.key for k in path), leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    def spec_of(path, leaf):
        return NamedSharding(mesh, param_pspec(tuple(k.key for k in path), leaf))

    return jax.tree_util.tree_map_with_path(spec_of, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
