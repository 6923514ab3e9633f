"""Tensor-parallel linear layers (functional).

TPU-native counterparts of the reference's ColumnParallelLinear /
RowParallelLinear / QKVParallelLinear / MergedColumnParallelLinear
(srt/layers/linear.py). Instead of manual all-reduce after row-parallel
matmuls, parameters carry PartitionSpecs over the "tp" mesh axis and GSPMD
inserts the psum/all_gather over ICI.

Fused projections are laid out with an explicit fusion axis
([hidden, n_fused, out_per_part]) so each fused part shards evenly over tp
— a reshape-free einsum keeps the sharding intact.

Quantization (--quantization int8|fp8|w8a8_int8): each layer captures the
process-global quant method at construction and emits its weight ParamSpec
with quant_method set; the loader stores int8/fp8 weights + per-channel
scales and the call path runs the fused dequant (or int8 MXU) matmul
(sglang_tpu/quantization). Ref: srt/layers/quantization/{fp8,w8a8_int8}.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.parallel.mesh import AXIS_TP
from sglang_tpu.quantization import dequant_matmul, get_quant_method


class ColumnParallelLinear:
    """y = x @ W (+ b); W: [in, out] sharded on out over tp."""

    def __init__(self, in_size: int, out_size: int, dtype, bias: bool = False):
        self.in_size, self.out_size, self.dtype, self.bias = (
            in_size,
            out_size,
            dtype,
            bias,
        )
        self.quant = get_quant_method()

    def specs(self, prefix: str) -> SpecTree:
        s = {
            join(prefix, "weight"): ParamSpec(
                (self.in_size, self.out_size), self.dtype, P(None, AXIS_TP),
                quant_method=self.quant, quant_axes=(0,),
            )
        }
        if self.bias:
            s[join(prefix, "bias")] = ParamSpec(
                (self.out_size,), self.dtype, P(AXIS_TP)
            )
        return s

    def __call__(self, params: Params, prefix: str, x: jax.Array) -> jax.Array:
        w = params[join(prefix, "weight")]
        if self.quant:
            y = dequant_matmul(
                x, w, params[join(prefix, "weight/qscale")], self.quant
            )
        else:
            y = jnp.dot(x, w, preferred_element_type=x.dtype)
        if self.bias:
            y = y + params[join(prefix, "bias")]
        return y


class RowParallelLinear:
    """y = x @ W; W: [in, out] sharded on in over tp; output replicated (psum)."""

    def __init__(self, in_size: int, out_size: int, dtype, bias: bool = False):
        self.in_size, self.out_size, self.dtype, self.bias = (
            in_size,
            out_size,
            dtype,
            bias,
        )
        self.quant = get_quant_method()

    def specs(self, prefix: str) -> SpecTree:
        s = {
            join(prefix, "weight"): ParamSpec(
                (self.in_size, self.out_size), self.dtype, P(AXIS_TP, None),
                quant_method=self.quant, quant_axes=(0,),
            )
        }
        if self.bias:
            s[join(prefix, "bias")] = ParamSpec((self.out_size,), self.dtype, P())
        return s

    def __call__(self, params: Params, prefix: str, x: jax.Array) -> jax.Array:
        w = params[join(prefix, "weight")]
        if self.quant:
            y = dequant_matmul(
                x, w, params[join(prefix, "weight/qscale")], self.quant
            )
        else:
            y = jnp.dot(x, w, preferred_element_type=x.dtype)
        if self.bias:
            y = y + params[join(prefix, "bias")]
        return y


class FusedColumnLinear:
    """n_fused column-parallel projections of equal width in one matmul.

    W: [in, n_fused, out_each] sharded (None, None, tp). Used for
    gate+up (MergedColumnParallelLinear analog) and k+v fusion.
    """

    def __init__(
        self, in_size: int, n_fused: int, out_each: int, dtype, bias: bool = False
    ):
        self.in_size, self.n_fused, self.out_each = in_size, n_fused, out_each
        self.dtype, self.bias = dtype, bias
        self.quant = get_quant_method()

    def specs(self, prefix: str) -> SpecTree:
        s = {
            join(prefix, "weight"): ParamSpec(
                (self.in_size, self.n_fused, self.out_each),
                self.dtype,
                P(None, None, AXIS_TP),
                quant_method=self.quant, quant_axes=(0,),
            )
        }
        if self.bias:
            s[join(prefix, "bias")] = ParamSpec(
                (self.n_fused, self.out_each), self.dtype, P(None, AXIS_TP)
            )
        return s

    def __call__(self, params: Params, prefix: str, x: jax.Array) -> jax.Array:
        # [T, in] x [in, n, out] -> [T, n, out]
        w = params[join(prefix, "weight")]
        dn = (((1,), (0,)), ((), ()))
        if self.quant:
            y = dequant_matmul(
                x, w, params[join(prefix, "weight/qscale")], self.quant,
                dimension_numbers=dn,
            )
        else:
            y = jax.lax.dot_general(
                x, w, dimension_numbers=dn, preferred_element_type=x.dtype
            )
        if self.bias:
            y = y + params[join(prefix, "bias")]
        return y
