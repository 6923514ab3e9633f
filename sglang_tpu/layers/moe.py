"""Mixture-of-Experts layer (TPU-native, dropless).

Behavioral reference: srt/layers/moe/{topk.py,fused_moe_triton/,ep_moe/}.
TPU design: tokens are sorted by routed expert and the expert FFNs run as
grouped matmuls via jax.lax.ragged_dot (the Megablox-style dropless
grouped GEMM XLA lowers to MXU-tiled kernels). Expert weights carry a
"tp"-axis PartitionSpec on the FFN hidden dim, so each chip computes every
expert on its intermediate shard (MoE-TP); expert-partitioned EP with
ragged all-to-all over a dedicated mesh axis is the planned extension.

Numerics match HF Mixtral/Qwen2MoE: softmax over top-k (Mixtral
renormalizes over the selected k; Qwen2MoE optionally normalizes), f32
routing math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.parallel.mesh import AXIS_TP


class FusedMoE:
    def __init__(
        self,
        num_experts: int,
        top_k: int,
        hidden_size: int,
        intermediate_size: int,
        dtype,
        renormalize: bool = True,
    ):
        self.num_experts = num_experts
        self.top_k = top_k
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.dtype = dtype
        self.renormalize = renormalize

    def specs(self, prefix: str) -> SpecTree:
        E, H, I = self.num_experts, self.hidden_size, self.intermediate_size
        return {
            join(prefix, "router"): ParamSpec((H, E), self.dtype, P()),
            # gate+up fused on a fusion axis; sharded on I over tp
            join(prefix, "w_gate_up"): ParamSpec(
                (E, H, 2, I), self.dtype, P(None, None, None, AXIS_TP)
            ),
            join(prefix, "w_down"): ParamSpec(
                (E, I, H), self.dtype, P(None, AXIS_TP, None)
            ),
        }

    def __call__(self, params: Params, prefix: str, x: jax.Array,
                 lora=None) -> jax.Array:
        """x: [T, H] -> [T, H]."""
        E, K = self.num_experts, self.top_k
        router_logits = jnp.dot(
            x.astype(jnp.float32), params[join(prefix, "router")].astype(
                jnp.float32
            )
        )  # [T, E]
        if self.renormalize:
            topk_logits, topk_idx = jax.lax.top_k(router_logits, K)
            topk_weights = jax.nn.softmax(topk_logits, axis=-1)
        else:
            probs = jax.nn.softmax(router_logits, axis=-1)
            topk_weights, topk_idx = jax.lax.top_k(probs, K)
        return self.compute_experts(params, prefix, x, topk_weights, topk_idx)

    def compute_experts(self, params: Params, prefix: str, x: jax.Array,
                        topk_weights: jax.Array, topk_idx: jax.Array
                        ) -> jax.Array:
        """Dropless grouped-GEMM expert compute given routing decisions."""
        T, H = x.shape
        E, K = self.num_experts, topk_idx.shape[-1]
        # Flatten (token, k) pairs and sort by expert for grouped GEMM.
        flat_expert = topk_idx.reshape(-1)  # [T*K]
        flat_weight = topk_weights.reshape(-1)  # [T*K]
        order = jnp.argsort(flat_expert)  # stable
        token_of = order // K  # source token per sorted slot
        x_sorted = x[token_of]  # [T*K, H]
        group_sizes = jnp.bincount(flat_expert, length=E).astype(jnp.int32)

        w_gu = params[join(prefix, "w_gate_up")]  # [E, H, 2, I]
        w_dn = params[join(prefix, "w_down")]  # [E, I, H]
        E_, H_, _, I_ = w_gu.shape
        gate = jax.lax.ragged_dot(
            x_sorted, w_gu[:, :, 0, :], group_sizes,
            preferred_element_type=x.dtype,
        )  # [T*K, I]
        up = jax.lax.ragged_dot(
            x_sorted, w_gu[:, :, 1, :], group_sizes,
            preferred_element_type=x.dtype,
        )
        h = jax.nn.silu(gate) * up
        out_sorted = jax.lax.ragged_dot(
            h, w_dn, group_sizes, preferred_element_type=x.dtype
        )  # [T*K, H]
        out_sorted = out_sorted * flat_weight[order][:, None].astype(out_sorted.dtype)

        # Scatter-add back to tokens.
        out = jnp.zeros((T, H), out_sorted.dtype)
        out = out.at[token_of].add(out_sorted)
        return out.astype(x.dtype)
