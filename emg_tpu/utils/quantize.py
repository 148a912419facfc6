"""int8 weight quantization for the cache-resident decode stack.

ROADMAP item 6 / round-2 verdict item 8: the autoregressive serving loops
(greedy / device beam) are HBM-bandwidth-bound on their per-step weight
reads — every step re-reads the whole decoder stack (self/cross attention
projections + FFN matmuls). Storing those kernels as int8 with a
per-output-channel scale halves the bf16 read traffic again (4x vs f32)
while the matmuls still run at the stream dtype: the dequantization
(convert + one broadcast multiply) fuses into each matmul's operand read,
so HBM sees int8 and the MXU sees bfloat16.

Mechanism: the quantized kernels are replaced IN the variables tree by
:class:`Int8Tensor` — a registered pytree node carrying ``(data_int8,
scale)`` that implements the ``__jax_array__`` protocol. Every consumer in
the model already reaches weights through ``jnp.asarray`` (the attention
einsum paths, models/attention.py:113-135) or through flax's
``promote_dtype`` (the FFN Dense layers), both of which honor
``__jax_array__``, so no module code changes: the tensor dequantizes
lazily at its point of use inside the step program.

Scaling is symmetric per OUTPUT channel (the standard weight-only scheme):
``scale = max|w| / 127`` reduced over the contraction axes, so each output
channel's quantization error is bounded by half an LSB of its own range.
Biases, LayerNorms, embeddings, the relative-position table, and the
logit heads (w_aux / w_out — float32 by design) are never quantized.

Scope: only the decoder stack (``transformerDecoder``) is quantized — the
encoder runs once per utterance while the decoder re-reads its weights
every token, which is where the traffic is. Token parity with the bf16
path at decisive logit margins is pinned by tests/test_quantize.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# leaf names quantized when reached inside the decoder stack
_ATTN_LEAVES = {"w_q", "w_k", "w_v", "w_o"}  # (H, Din, Dout): contract axis 1
_DENSE_MODULES = {"linear1", "linear2"}  # kernel (Din, Dout): contract axis 0


@jax.tree_util.register_pytree_node_class
class Int8Tensor:
    """An int8-quantized weight that dequantizes lazily via __jax_array__.

    ``data`` is int8, ``scale`` broadcasts against it (keepdims over the
    contraction axes). ``dequant_dtype`` is the dtype handed to consumers
    (the serving compute dtype, bfloat16).
    """

    def __init__(self, data, scale, dequant_dtype=jnp.bfloat16):
        self.data = data
        self.scale = scale
        self.dequant_dtype = jnp.dtype(dequant_dtype)

    # -- array protocol ----------------------------------------------------
    def __jax_array__(self):
        return self.data.astype(self.dequant_dtype) * self.scale.astype(
            self.dequant_dtype
        )

    def astype(self, dtype):
        return self.__jax_array__().astype(dtype)

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    @property
    def dtype(self):  # what consumers will see after dequantization
        return self.dequant_dtype

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        return (self.data, self.scale), (self.dequant_dtype,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, scale = children
        return cls(data, scale, aux[0])

    def __repr__(self):
        return (f"Int8Tensor(shape={tuple(self.data.shape)}, "
                f"dequant={self.dequant_dtype})")


def quantize_tensor(w, reduce_axes, dequant_dtype=jnp.bfloat16) -> Int8Tensor:
    """Symmetric per-output-channel int8 quantization of one weight."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    data = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return Int8Tensor(data, scale.astype(jnp.float32), dequant_dtype)


def quantize_decoder_int8(variables, dequant_dtype=jnp.bfloat16):
    """Return ``variables`` with the decoder stack's matmul kernels int8.

    Composes with (and should be applied after) serving-time bf16 casting:
    non-quantized leaves pass through untouched.
    """

    def q(path, leaf):
        if isinstance(leaf, Int8Tensor):  # idempotent
            return leaf
        names = [getattr(p, "key", str(p)) for p in path]
        if "transformerDecoder" not in names:
            return leaf
        if names[-1] in _ATTN_LEAVES:
            return quantize_tensor(leaf, (1,), dequant_dtype)
        if (len(names) >= 2 and names[-2] in _DENSE_MODULES
                and names[-1] == "kernel"):
            return quantize_tensor(leaf, (0,), dequant_dtype)
        return leaf

    params = jax.tree_util.tree_map_with_path(
        q, variables["params"], is_leaf=lambda x: isinstance(x, Int8Tensor)
    )
    out = dict(variables)
    out["params"] = params
    return out
