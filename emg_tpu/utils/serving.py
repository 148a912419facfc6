"""Serving-time parameter casting.

The model modules cast their matmul weights to the activation dtype at
every use (``.astype(x.dtype)`` in models/attention.py projections, flax
``Dense(dtype=...)`` promotion rules). Inside a decode ``while_loop`` that
cast is loop-invariant, but XLA may choose to fuse the f32->bf16 convert
into each matmul instead of hoisting it — re-reading the float32 copies of
the weights from HBM every step (~200 MB/step for the 6-layer decoder).
Casting the affected leaves ONCE, before the loop, makes the in-loop casts
no-ops without changing numerics: the matmuls see bit-identical bfloat16
weights either way.

Only the big matmul operands are cast. LayerNorm/BatchNorm parameters and
statistics, embeddings, the relative-positional table, and the output heads
(w_aux/w_out run float32 by design) keep float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# leaf names cast when reached through an attention or feed-forward module
_ATTN_LEAVES = {"w_q", "w_k", "w_v", "w_o"}
_DENSE_MODULES = {"linear1", "linear2", "w_raw_in"}
_CONV_MODULES = {"conv1", "conv2", "residual_path"}


def cast_params_for_serving(variables, dtype=jnp.bfloat16):
    """Return ``variables`` with the serving-hot matmul/conv weights cast.

    Matches exactly the set of leaves the modules themselves cast when the
    activation stream runs at ``dtype`` (see module docstring), so serving
    numerics are unchanged — only the per-step conversions disappear.
    """

    from emg_tpu.utils.quantize import Int8Tensor

    def cast(path, leaf):
        if isinstance(leaf, Int8Tensor):  # already quantized: leave as-is
            return leaf
        names = [getattr(p, "key", str(p)) for p in path]
        if names and names[-1] in _ATTN_LEAVES:
            return leaf.astype(dtype)
        if len(names) >= 2 and names[-2] in _DENSE_MODULES | _CONV_MODULES:
            # kernel and bias of the FFN/input/conv layers (flax Dense/Conv
            # with dtype=bf16 casts both)
            return leaf.astype(dtype)
        return leaf

    params = jax.tree_util.tree_map_with_path(
        cast, variables["params"], is_leaf=lambda x: isinstance(x, Int8Tensor)
    )
    out = dict(variables)
    out["params"] = params
    return out
