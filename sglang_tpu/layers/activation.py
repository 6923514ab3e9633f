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


def relu2(x: jax.Array) -> jax.Array:
    """relu(x)^2 (Nemotron/Arcee 'relu2')."""
    r = jax.nn.relu(x)
    return r * r


def gelu_new(x: jax.Array) -> jax.Array:
    """HF NewGELUActivation / 'gelu_new' (tanh approximation)."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


# Single-input activations for non-gated MLPs (fc1->act->fc2 families).
ACT_SINGLE = {
    "relu": jax.nn.relu,
    "relu2": relu2,
    "silu": jax.nn.silu,
    "gelu": gelu_exact,
    "gelu_new": gelu_new,
    "gelu_pytorch_tanh": gelu_new,
}
