"""GLM-4.5 / GLM-4.6 MoE (Zhipu).

Behavioral reference: srt/models/glm4_moe.py (HF modeling_glm4_moe as
the parity oracle). Llama-style attention with optional per-head qk-norm
and partial rotary, DeepSeek-V3-class routing: sigmoid scores plus a
learned e_score_correction_bias for SELECTION (weights come from the
raw sigmoid scores), group-limited top-k where each group is scored by
the sum of its top-2 biased scores, renormalized, scaled by
routed_scaling_factor; shared experts added ungated; first k layers
dense. Token-identical to HF (tests/test_moe_models2.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.base import ParamSpec, SpecTree, join
from sglang_tpu.layers.linear import FusedColumnLinear, RowParallelLinear
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.models.llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
)
from jax.sharding import PartitionSpec as P


def sigmoid_group_topk(scores: jax.Array, bias: jax.Array, top_k: int,
                       n_group: int, topk_group: int, norm_topk: bool,
                       routed_scaling: float):
    """DeepSeek-V3 'noaux_tc' routing (HF Glm4MoeTopkRouter.
    get_topk_indices): biased scores pick, raw scores weigh."""
    T, E = scores.shape
    for_choice = scores + bias[None, :]  # [T, E]
    if n_group > 1:
        per = E // n_group
        grp = for_choice.reshape(T, n_group, per)
        top2 = jax.lax.top_k(grp, min(2, per))[0].sum(axis=-1)  # [T, G]
        _, gidx = jax.lax.top_k(top2, topk_group)
        gmask = jnp.zeros((T, n_group), for_choice.dtype).at[
            jnp.arange(T)[:, None], gidx
        ].set(1.0)
        for_choice = jnp.where(
            jnp.repeat(gmask, per, axis=1) > 0, for_choice, 0.0
        )
    _, idx = jax.lax.top_k(for_choice, top_k)
    w = jnp.take_along_axis(scores, idx, axis=1)
    if norm_topk:
        w = w / (w.sum(axis=-1, keepdims=True) + 1e-20)
    return w * routed_scaling, idx


class Glm4MoeSparseBlock:
    def __init__(self, config: ModelConfig):
        c = config
        hf = c.hf_config
        self.n_experts = hf.n_routed_experts
        self.top_k = hf.num_experts_per_tok
        self.n_group = getattr(hf, "n_group", 1) or 1
        self.topk_group = getattr(hf, "topk_group", 1) or 1
        self.norm_topk = bool(getattr(hf, "norm_topk_prob", True))
        self.routed_scaling = getattr(hf, "routed_scaling_factor", 1.0)
        self.dtype = c.dtype
        self.moe = FusedMoE(
            num_experts=self.n_experts,
            top_k=self.top_k,
            hidden_size=c.hidden_size,
            intermediate_size=hf.moe_intermediate_size,
            dtype=c.dtype,
        )
        n_shared = getattr(hf, "n_shared_experts", 0) or 0
        self.shared = bool(n_shared)
        if self.shared:
            inter = hf.moe_intermediate_size * n_shared
            self.sh_gate_up = FusedColumnLinear(c.hidden_size, 2, inter,
                                                c.dtype)
            self.sh_down = RowParallelLinear(inter, c.hidden_size, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = self.moe.specs(p)
        s[join(p, "router_bias")] = ParamSpec(
            (self.n_experts,), jnp.float32, P(), init_scale=0.0
        )
        if self.shared:
            s.update(self.sh_gate_up.specs(join(p, "shared_gate_up")))
            s.update(self.sh_down.specs(join(p, "shared_down")))
        return s

    def __call__(self, params, p, x):
        from sglang_tpu.eplb import maybe_record

        logits = jnp.dot(
            x.astype(jnp.float32), params[join(p, "router")].astype(jnp.float32)
        )
        scores = jax.nn.sigmoid(logits)
        w, idx = sigmoid_group_topk(
            scores, params[join(p, "router_bias")], self.top_k,
            self.n_group, self.topk_group, self.norm_topk,
            self.routed_scaling,
        )
        maybe_record(p, idx, self.n_experts)
        l2p = params[join(p, "eplb_log2phy")]
        sel = l2p[idx][..., 0] if l2p.ndim == 2 else l2p[idx]
        out = self.moe.compute_experts(params, p, x, w.astype(jnp.float32),
                                       sel)
        if self.shared:
            h = silu_and_mul(self.sh_gate_up(params,
                                             join(p, "shared_gate_up"), x))
            out = out + self.sh_down(params, join(p, "shared_down"), h)
        return out


class Glm4MoeAttention(LlamaAttention):
    """Partial neox rotary (rotate_half over the first rotary_dim dims —
    unlike dense GLM's interleaved tables)."""

    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        pr = getattr(c.hf_config, "partial_rotary_factor", 1.0) or 1.0
        if pr != 1.0:
            from sglang_tpu.layers.rotary import RotaryEmbedding

            self.rotary = RotaryEmbedding(
                self.hd, int(self.hd * pr), c.context_length,
                c.rope_theta, c.rope_scaling,
            )


class Glm4MoeForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        c = config
        hf = c.hf_config
        if getattr(hf, "use_qk_norm", False):
            c.qk_norm = True
        super().__init__(c)
        first_dense = getattr(hf, "first_k_dense_replace", 0) or 0
        for i, layer in enumerate(self.decoder_layers):
            layer.attn = Glm4MoeAttention(c, i)
            if getattr(hf, "n_routed_experts", 0) and i >= first_dense:
                layer.mlp = Glm4MoeSparseBlock(c)

    def map_hf_weight(self, name: str, arr: np.ndarray):
        pre = self.hf_prefix
        if ".mlp." in name and (".experts." in name or ".gate." in name
                                or "shared_experts" in name):
            rest = name[len(pre) + 8 :]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}/mlp"
            if sub == "mlp.gate.weight":
                return [(f"{p}/router", None, arr.T)]
            if sub == "mlp.gate.e_score_correction_bias":
                return [(f"{p}/router_bias", None, arr)]
            if sub.startswith("mlp.shared_experts."):
                w = sub.split(".")[2]
                m = {"gate_proj": (f"{p}/shared_gate_up/weight", 0),
                     "up_proj": (f"{p}/shared_gate_up/weight", 1),
                     "down_proj": (f"{p}/shared_down/weight", None)}
                pname, slot = m[w]
                return [(pname, slot, arr.T)]
            if sub.startswith("mlp.experts."):
                parts = sub.split(".")
                e, w = int(parts[2]), parts[3]
                m = {"gate_proj": ("expert_gate", e),
                     "up_proj": ("expert_up", e),
                     "down_proj": ("expert_down", e)}
                target = f"{p}/w_gate_up" if w != "down_proj" else f"{p}/w_down"
                return [(target, m[w], arr.T)]
            return []
        return super().map_hf_weight(name, arr)
