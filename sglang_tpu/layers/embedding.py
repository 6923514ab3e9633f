"""Vocab-parallel embedding + LM head.

Ref: srt/layers/vocab_parallel_embedding.py:188 (VocabParallelEmbedding) and
:587 (ParallelLMHead). TPU-native: the embedding table is sharded over tp on
the vocab axis; the gather and the final logits matmul are plain jnp ops and
GSPMD handles the collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.parallel.mesh import AXIS_TP


class VocabEmbedding:
    def __init__(self, vocab_size: int, hidden_size: int, dtype):
        self.vocab_size, self.hidden_size, self.dtype = vocab_size, hidden_size, dtype

    def specs(self, prefix: str) -> SpecTree:
        return {
            join(prefix, "weight"): ParamSpec(
                (self.vocab_size, self.hidden_size), self.dtype, P(AXIS_TP, None)
            )
        }

    def __call__(self, params: Params, prefix: str, ids: jax.Array) -> jax.Array:
        return params[join(prefix, "weight")][ids]


class LMHead:
    """logits = h @ W.T; W: [vocab, hidden] sharded on vocab over tp."""

    def __init__(self, vocab_size: int, hidden_size: int, dtype,
                 bias: bool = False):
        self.vocab_size, self.hidden_size, self.dtype = vocab_size, hidden_size, dtype
        self.bias = bias  # PhiMoE lm_head_bias

    def specs(self, prefix: str) -> SpecTree:
        s = {
            join(prefix, "weight"): ParamSpec(
                (self.vocab_size, self.hidden_size), self.dtype, P(AXIS_TP, None)
            )
        }
        if self.bias:
            s[join(prefix, "bias")] = ParamSpec(
                (self.vocab_size,), self.dtype, P(AXIS_TP), init_scale=0.0
            )
        return s

    def __call__(self, params: Params, prefix: str, h: jax.Array) -> jax.Array:
        w = params[join(prefix, "weight")]
        logits = jax.lax.dot_general(
            h,
            w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if self.bias:
            logits = logits + params[join(prefix, "bias")].astype(jnp.float32)
        return logits
