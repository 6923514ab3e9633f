"""Activations. Ref: srt/layers/activation.py (SiluAndMul, GeluAndMul)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(gate_up: jax.Array) -> jax.Array:
    """gate_up: [T, 2, I] (fused layout from FusedColumnLinear)."""
    gate, up = gate_up[:, 0, :], gate_up[:, 1, :]
    return jax.nn.silu(gate) * up


def gelu_tanh_and_mul(gate_up: jax.Array) -> jax.Array:
    gate, up = gate_up[:, 0, :], gate_up[:, 1, :]
    return jax.nn.gelu(gate, approximate=True) * up


ACT2FN = {
    "silu": silu_and_mul,
    "gelu": gelu_tanh_and_mul,
    "gelu_pytorch_tanh": gelu_tanh_and_mul,
}
