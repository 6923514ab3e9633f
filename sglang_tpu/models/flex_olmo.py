"""FlexOlmo (AI2): OLMo-2 post-norm blocks with an OLMoE-style MoE FF.

Behavioral reference: HF FlexOlmoForCausalLM — flat q/k RMSNorm before
rope + post-norm residuals (OLMo-2), softmax-then-topk routing without
renormalization unless norm_topk_prob (OLMoE semantics).
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.models.olmo2 import Olmo2ForCausalLM


class FlexOlmoForCausalLM(Olmo2ForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        renorm = bool(getattr(c.hf_config, "norm_topk_prob", False))
        for layer in self.decoder_layers:
            layer.mlp = FusedMoE(
                num_experts=c.num_experts,
                top_k=c.num_experts_per_tok,
                hidden_size=c.hidden_size,
                intermediate_size=c.intermediate_size,
                dtype=c.dtype,
                renormalize=renorm,
            )

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if ".mlp." in name and name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}/mlp"
            if sub == "mlp.gate.weight":
                return [(f"{p}/router", None, arr.T)]
            if sub.startswith("mlp.experts."):
                parts = sub.split(".")
                e, w = int(parts[2]), parts[3]
                m = {"gate_proj": ("expert_gate", e),
                     "up_proj": ("expert_up", e),
                     "down_proj": ("expert_down", e)}
                target = (f"{p}/w_gate_up" if w != "down_proj"
                          else f"{p}/w_down")
                return [(target, m[w], arr.T)]
            return []
        return super().map_hf_weight(name, arr)
