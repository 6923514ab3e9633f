"""RMSNorm / LayerNorm (functional). Ref: srt/layers/layernorm.py.

Computed in float32 and cast back — matches HF Llama semantics so greedy
decode is token-identical. Fused residual-add variant returns (out, resid)
like the reference's fused_add_rmsnorm path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join


class LayerNorm:
    """Full LayerNorm (Starcoder2/GPT-class; Cohere uses bias=False)."""

    def __init__(self, size: int, eps: float, dtype, bias: bool = True,
                 plus_one: bool = False):
        # plus_one: out = x_norm * (1 + w) + b (Nemotron LayerNorm1P)
        self.size, self.eps, self.dtype = size, eps, dtype
        self.bias = bias
        self.plus_one = plus_one

    def specs(self, prefix: str) -> SpecTree:
        # Dummy-load init: plain norms get weight=1 (plus_one variants get
        # 0, which is effectively 1) so dummy-weight runs produce
        # non-degenerate logits — a zero norm weight would collapse every
        # hidden state (and make dryrun parity checks vacuous).
        import numpy as _np

        w_init = None if self.plus_one else _np.ones(self.size, _np.float32)
        s = {
            join(prefix, "weight"): ParamSpec(
                (self.size,), self.dtype, P(), init_scale=0.0,
                init_value=w_init,
            ),
        }
        if self.bias:
            s[join(prefix, "bias")] = ParamSpec(
                (self.size,), self.dtype, P(), init_scale=0.0
            )
        return s

    def __call__(self, params: Params, prefix: str, x: jax.Array):
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        w = params[join(prefix, "weight")].astype(jnp.float32)
        if self.plus_one:
            w = w + 1.0
        xf = xf * w
        if self.bias:
            xf = xf + params[join(prefix, "bias")].astype(jnp.float32)
        return xf.astype(orig_dtype)


class RMSNorm:
    def __init__(self, size: int, eps: float, dtype, gemma_style: bool = False):
        # gemma_style: out = x_norm * (1 + w) (HF Gemma/Gemma2 convention)
        self.size, self.eps, self.dtype = size, eps, dtype
        self.gemma_style = gemma_style

    def specs(self, prefix: str) -> SpecTree:
        # See LayerNorm.specs: dummy init 1 for plain RMSNorm, 0 for
        # gemma_style (whose effective weight is w + 1).
        import numpy as _np

        w_init = (
            None if self.gemma_style else _np.ones(self.size, _np.float32)
        )
        return {
            join(prefix, "weight"): ParamSpec(
                (self.size,), self.dtype, P(), init_scale=0.0,
                init_value=w_init,
            )
        }

    def __call__(
        self,
        params: Params,
        prefix: str,
        x: jax.Array,
        residual: Optional[jax.Array] = None,
    ):
        orig_dtype = x.dtype
        if residual is not None:
            x = x + residual
            residual = x
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        w = params[join(prefix, "weight")].astype(jnp.float32)
        if self.gemma_style:
            w = 1.0 + w
        out = (xf * w).astype(orig_dtype)
        if residual is not None:
            return out, residual
        return out
