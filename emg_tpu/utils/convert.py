"""Reference-checkpoint converter: PyTorch state_dict -> flax variables.

Maps the reference Model's (DataParallel ``module.``-prefixed) parameter
names (architecture.py:50-71, transformer.py) onto this framework's
parameter tree so a trained reference checkpoint can be evaluated here for
parity testing. Conventions converted:

  Conv1d weight (out, in, k)    -> flax Conv kernel (k, in, out)
  Linear weight (out, in)       -> flax Dense kernel (in, out)
  LayerNorm weight/bias         -> scale/bias
  BatchNorm weight/bias         -> scale/bias (params)
  BatchNorm running_mean/var    -> batch_stats mean/var
  rel-pos embeddings (H,N,D,1)  -> (H, N, D)

Input may be a real ``torch.load`` result or any mapping of numpy arrays
with the same key names (torch is only needed to read .pt files).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_reference_state_dict(state_dict: Mapping[str, Any],
                                 num_layers_encoder: int = 6,
                                 num_layers_decoder: int = 6):
    """Returns {'params': ..., 'batch_stats': ...} flax-style trees."""
    sd = {k[len("module."):] if k.startswith("module.") else k: _np(v)
          for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    def conv(src, dst):
        _set(params, dst + ("kernel",), sd[src + ".weight"].transpose(2, 1, 0))
        _set(params, dst + ("bias",), sd[src + ".bias"])

    def dense(src, dst):
        _set(params, dst + ("kernel",), sd[src + ".weight"].T)
        _set(params, dst + ("bias",), sd[src + ".bias"])

    def norm(src, dst):
        _set(params, dst + ("scale",), sd[src + ".weight"])
        _set(params, dst + ("bias",), sd[src + ".bias"])

    def bn(src, dst):
        _set(params, dst + ("scale",), sd[src + ".weight"])
        _set(params, dst + ("bias",), sd[src + ".bias"])
        _set(stats, dst + ("mean",), sd[src + ".running_mean"])
        _set(stats, dst + ("var",), sd[src + ".running_var"])

    # CNN stack
    for i in range(3):
        base = f"conv_blocks.{i}"
        dst = ("conv_blocks", f"block{i}")
        conv(f"{base}.conv1", dst + ("conv1",))
        bn(f"{base}.bn1", dst + ("bn1",))
        conv(f"{base}.conv2", dst + ("conv2",))
        bn(f"{base}.bn2", dst + ("bn2",))
        conv(f"{base}.residual_path", dst + ("residual_path",))
        bn(f"{base}.res_norm", dst + ("res_norm",))

    dense("w_raw_in", ("w_raw_in",))
    _set(params, ("embedding_tgt", "embedding"), sd["embedding_tgt.weight"])

    def mha(src, dst, relative: bool):
        for w in ("w_q", "w_k", "w_v", "w_o"):
            _set(params, dst + (w,), sd[f"{src}.{w}"])
        if relative:
            emb = sd[f"{src}.relative_positional.embeddings"]
            _set(params, dst + ("relative_positional", "embeddings"), emb[..., 0])

    for i in range(num_layers_encoder):
        base = f"transformerEncoder.layers.{i}"
        dst = ("transformerEncoder", f"layer{i}")
        mha(f"{base}.self_attn", dst + ("self_attn",), relative=True)
        dense(f"{base}.linear1", dst + ("ff", "linear1"))
        dense(f"{base}.linear2", dst + ("ff", "linear2"))
        norm(f"{base}.norm1", dst + ("norm1",))
        norm(f"{base}.norm2", dst + ("norm2",))

    for i in range(num_layers_decoder):
        base = f"transformerDecoder.layers.{i}"
        dst = ("transformerDecoder", f"layer{i}")
        mha(f"{base}.self_attn", dst + ("self_attn",), relative=False)
        mha(f"{base}.multihead_attn", dst + ("multihead_attn",), relative=False)
        dense(f"{base}.linear1", dst + ("ff", "linear1"))
        dense(f"{base}.linear2", dst + ("ff", "linear2"))
        norm(f"{base}.norm1", dst + ("norm1",))
        norm(f"{base}.norm2", dst + ("norm2",))
        norm(f"{base}.norm3", dst + ("norm3",))

    dense("w_aux", ("w_aux",))
    dense("w_out", ("w_out",))
    return {"params": params, "batch_stats": stats}


def load_reference_checkpoint(path: str, **kw):
    """Read a reference .pt checkpoint (requires torch) and convert."""
    import torch

    return convert_reference_state_dict(torch.load(path, map_location="cpu"), **kw)
