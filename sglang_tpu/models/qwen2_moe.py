"""Qwen2-MoE / Qwen3-MoE decoders.

Behavioral reference: srt/models/qwen2_moe.py, qwen3_moe.py. Qwen2-MoE adds
a shared expert (dense MLP gated by a sigmoid scalar head) alongside the
routed experts; Qwen3-MoE drops the shared expert and adds q/k RMSNorm.
HF names: mlp.gate.weight, mlp.experts.E.{gate,up,down}_proj.weight,
mlp.shared_expert.{gate,up,down}_proj.weight, mlp.shared_expert_gate.weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, SpecTree, join
from sglang_tpu.layers.linear import FusedColumnLinear, RowParallelLinear
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.models.llama import LlamaDecoderLayer, LlamaForCausalLM
from jax.sharding import PartitionSpec as P


class Qwen2MoeSparseBlock:
    def __init__(self, config: ModelConfig, shared_expert: bool):
        c = config
        inter = c.moe_intermediate_size or c.intermediate_size
        norm_topk = bool(
            getattr(c.hf_config, "norm_topk_prob", True) if c.hf_config else True
        )
        self.moe = FusedMoE(
            num_experts=c.num_experts,
            top_k=c.num_experts_per_tok,
            hidden_size=c.hidden_size,
            intermediate_size=inter,
            dtype=c.dtype,
            renormalize=norm_topk,
        )
        self.shared_expert = shared_expert
        if shared_expert:
            shared_inter = (
                getattr(c.hf_config, "shared_expert_intermediate_size", None)
                if c.hf_config
                else None
            ) or c.intermediate_size
            self.sh_gate_up = FusedColumnLinear(
                c.hidden_size, 2, shared_inter, c.dtype
            )
            self.sh_down = RowParallelLinear(shared_inter, c.hidden_size, c.dtype)
            self.dtype = c.dtype
            self.hidden_size = c.hidden_size

    def specs(self, p: str) -> SpecTree:
        s = self.moe.specs(p)
        if self.shared_expert:
            s.update(self.sh_gate_up.specs(join(p, "shared_gate_up")))
            s.update(self.sh_down.specs(join(p, "shared_down")))
            s[join(p, "shared_gate")] = ParamSpec(
                (self.hidden_size, 1), self.dtype, P()
            )
        return s

    def __call__(self, params, p, x):
        out = self.moe(params, p, x)
        if self.shared_expert:
            h = silu_and_mul(self.sh_gate_up(params, join(p, "shared_gate_up"), x))
            sh = self.sh_down(params, join(p, "shared_down"), h)
            gate = jax.nn.sigmoid(
                jnp.dot(x.astype(jnp.float32), params[join(p, "shared_gate")]
                        .astype(jnp.float32))
            ).astype(x.dtype)  # [T, 1]
            out = out + gate * sh
        return out


class Qwen2MoeForCausalLM(LlamaForCausalLM):
    shared_expert = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        for layer in self.decoder_layers:
            layer.mlp = Qwen2MoeSparseBlock(config, self.shared_expert)

    def map_hf_weight(self, name: str, arr: np.ndarray):
        pre = self.hf_prefix
        if ".mlp." in name and (".experts." in name or ".gate." in name
                                or "shared_expert" in name):
            rest = name[len(pre) + 8 :]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}/mlp"
            if sub == "mlp.gate.weight":
                return [(f"{p}/router", None, arr.T)]
            if sub == "mlp.shared_expert_gate.weight":
                return [(f"{p}/shared_gate", None, arr.T)]
            if sub.startswith("mlp.shared_expert."):
                w = sub.split(".")[2]
                m = {
                    "gate_proj": (f"{p}/shared_gate_up/weight", 0),
                    "up_proj": (f"{p}/shared_gate_up/weight", 1),
                    "down_proj": (f"{p}/shared_down/weight", None),
                }
                pname, slot = m[w]
                return [(pname, slot, arr.T)]
            if sub.startswith("mlp.experts."):
                parts = sub.split(".")
                e = int(parts[2])
                w = parts[3]
                m = {
                    "gate_proj": ("expert_gate", e),
                    "up_proj": ("expert_up", e),
                    "down_proj": ("expert_down", e),
                }
                return [(f"{p}/w_gate_up" if w != "down_proj" else f"{p}/w_down",
                         m[w], arr.T)]
            return []
        return super().map_hf_weight(name, arr)


class Qwen3MoeForCausalLM(Qwen2MoeForCausalLM):
    shared_expert = False

    def __init__(self, config: ModelConfig):
        config.qk_norm = True
        super().__init__(config)
