"""Mixture-of-Experts layer (TPU-native, dropless).

Behavioral reference: srt/layers/moe/{topk.py,fused_moe_triton/,ep_moe/}.
TPU design: tokens are sorted by routed expert and the expert FFNs run as
grouped matmuls via jax.lax.ragged_dot (the Megablox-style dropless
grouped GEMM XLA lowers to MXU-tiled kernels).

Two parallelism modes:
- MoE-TP (default): expert weights carry a "tp"-axis PartitionSpec on the
  FFN hidden dim, so each chip computes every expert on its intermediate
  shard.
- EP (--ep-size == tp_size, ref srt/layers/moe/ep_moe/): experts are
  partitioned over the same devices. Each shard runs ONE grouped GEMM over
  the globally expert-sorted token stream, with zero-weight "before"/
  "after" padding groups absorbing the rows routed to other shards (their
  outputs are exactly zero), then a psum over the axis combines shard
  results — dropless and exact with no host-side dispatch. A ragged
  all-to-all dispatch (send each token only to its experts' shard) is the
  planned bandwidth optimization.

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
from sglang_tpu.parallel.mesh import AXIS_TP, get_mesh_context


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
        ctx = get_mesh_context()
        self.ep_size = ctx.ep_size if (
            ctx.ep_size > 1 and num_experts % ctx.ep_size == 0
        ) else 1
        from sglang_tpu.quantization import get_quant_method

        # Expert weights quantize per (expert, out-channel); the dequant
        # multiply fuses into the ragged_dot operand read. w8a8's dynamic
        # activation path doesn't compose with ragged_dot (int8 grouped
        # GEMM unsupported) — it degrades to weight-only here.
        self.quant = get_quant_method()

    def specs(self, prefix: str) -> SpecTree:
        E, H, I = self.num_experts, self.hidden_size, self.intermediate_size
        if self.ep_size > 1:
            # EP: shard the EXPERT dim over the tp-axis devices.
            gu_spec = P(AXIS_TP, None, None, None)
            dn_spec = P(AXIS_TP, None, None)
        else:
            # MoE-TP: shard the FFN hidden dim.
            gu_spec = P(None, None, None, AXIS_TP)
            dn_spec = P(None, AXIS_TP, None)
        return {
            join(prefix, "router"): ParamSpec((H, E), self.dtype, P()),
            join(prefix, "w_gate_up"): ParamSpec(
                (E, H, 2, I), self.dtype, gu_spec,
                quant_method=self.quant, quant_axes=(1,),
            ),
            join(prefix, "w_down"): ParamSpec(
                (E, I, H), self.dtype, dn_spec,
                quant_method=self.quant, quant_axes=(1,),
            ),
        }

    def _expert_weights(self, params: Params, prefix: str, dtype):
        """(w_gate_up, w_down), dequantized when quantization is on."""
        w_gu = params[join(prefix, "w_gate_up")]
        w_dn = params[join(prefix, "w_down")]
        if self.quant:
            s_gu = params[join(prefix, "w_gate_up/qscale")]  # [E, 2, I]
            s_dn = params[join(prefix, "w_down/qscale")]  # [E, H]
            w_gu = w_gu.astype(dtype) * s_gu[:, None].astype(dtype)
            w_dn = w_dn.astype(dtype) * s_dn[:, None].astype(dtype)
        return w_gu, w_dn

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

    @staticmethod
    def _grouped_ffn(x_sorted, group_sizes, w_gu, w_dn):
        """gate/up/down grouped GEMMs over an expert-sorted token stream."""
        gate = jax.lax.ragged_dot(
            x_sorted, w_gu[:, :, 0, :], group_sizes,
            preferred_element_type=x_sorted.dtype,
        )  # [TK, I]
        up = jax.lax.ragged_dot(
            x_sorted, w_gu[:, :, 1, :], group_sizes,
            preferred_element_type=x_sorted.dtype,
        )
        h = jax.nn.silu(gate) * up
        return jax.lax.ragged_dot(
            h, w_dn, group_sizes, preferred_element_type=x_sorted.dtype
        )  # [TK, H]

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

        w_gu, w_dn = self._expert_weights(params, prefix, x.dtype)
        w_sorted = flat_weight[order][:, None]

        if self.ep_size > 1:
            out_sorted = self._experts_ep(
                x_sorted, group_sizes, w_gu, w_dn
            )
        else:
            out_sorted = self._grouped_ffn(x_sorted, group_sizes, w_gu, w_dn)
        out_sorted = out_sorted * w_sorted.astype(out_sorted.dtype)

        # Scatter-add back to tokens.
        out = jnp.zeros((T, H), out_sorted.dtype)
        out = out.at[token_of].add(out_sorted)
        return out.astype(x.dtype)

    def _experts_ep(self, x_sorted, group_sizes, w_gu, w_dn):
        """Expert-parallel grouped GEMM: each shard holds E/ep experts and
        processes the FULL sorted stream with zero-weight padding groups for
        the rows owned by other shards (their outputs are exactly zero —
        silu(0)*0 through zero down-weights), then psum combines shards."""
        E = self.num_experts
        ep = self.ep_size
        El = E // ep
        TK = x_sorted.shape[0]
        ctx = get_mesh_context()

        def local(xs, gs, gu, dn):
            # gu [El, H, 2, I]; dn [El, I, H] (this shard's experts)
            idx = jax.lax.axis_index(AXIS_TP)
            eids = jnp.arange(E, dtype=jnp.int32)
            n_before = jnp.sum(jnp.where(eids < idx * El, gs, 0))
            gs_local = jax.lax.dynamic_slice_in_dim(gs, idx * El, El)
            n_after = TK - n_before - jnp.sum(gs_local)
            gs_pad = jnp.concatenate(
                [n_before[None], gs_local, n_after[None]]
            ).astype(jnp.int32)
            zgu = jnp.zeros((1,) + gu.shape[1:], gu.dtype)
            zdn = jnp.zeros((1,) + dn.shape[1:], dn.dtype)
            gu_pad = jnp.concatenate([zgu, gu, zgu], axis=0)
            dn_pad = jnp.concatenate([zdn, dn, zdn], axis=0)
            out = self._grouped_ffn(xs, gs_pad, gu_pad, dn_pad)
            return jax.lax.psum(out, AXIS_TP)

        return jax.shard_map(
            local,
            mesh=ctx.mesh,
            in_specs=(P(), P(), P(AXIS_TP, None, None, None),
                      P(AXIS_TP, None, None)),
            out_specs=P(),
            check_vma=False,
        )(x_sorted, group_sizes, w_gu, w_dn)
