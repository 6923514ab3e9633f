"""rednote dots.llm1 (DeepSeek-V3-style MoE with standard GQA attention).

Behavioral reference: srt/models/dots.py lineage + HF modeling_dots1:
Qwen-like attention with per-head q/k RMSNorm (pre-rope), dense layers
for the first `first_k_dense_replace`, then sigmoid + bias-corrected
group-limited top-k routing (the DSv3 noaux-tc router, reused from
models/deepseek_v2.DeepseekV2MoE) with shared experts. Token-identical
to HF (tests/test_model_zoo_r5b.py).
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.models.deepseek_v2 import DeepseekV2MoE
from sglang_tpu.models.llama import LlamaForCausalLM


class Dots1ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        config.qk_norm = True  # head-dim RMSNorm before rope (HF Dots1)
        if not getattr(hf, "scoring_func", None):
            # HF's port hardcodes the sigmoid router; DeepseekV2MoE keys
            # its routing mode off this field.
            hf.scoring_func = "sigmoid"
        super().__init__(config)
        first_dense = int(getattr(hf, "first_k_dense_replace", 0) or 0)
        for i, layer in enumerate(self.decoder_layers):
            if getattr(hf, "n_routed_experts", 0) and i >= first_dense:
                layer.mlp = DeepseekV2MoE(config)

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name.startswith("model.layers.") and ".mlp." in name:
            rest = name[len("model.layers."):]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}"
            flat = {
                "mlp.gate.weight": (f"{p}/mlp/router", None, "t"),
                "mlp.gate.e_score_correction_bias": (
                    f"{p}/mlp/router_bias", None, ""),
                "mlp.shared_experts.gate_proj.weight": (
                    f"{p}/mlp/shared_gate_up/weight", 0, "t"),
                "mlp.shared_experts.up_proj.weight": (
                    f"{p}/mlp/shared_gate_up/weight", 1, "t"),
                "mlp.shared_experts.down_proj.weight": (
                    f"{p}/mlp/shared_down/weight", None, "t"),
            }
            if sub in flat:
                pname, slot, tf = flat[sub]
                return [(pname, slot, arr.T if tf else arr)]
            if sub.startswith("mlp.experts."):
                parts = sub.split(".")
                e, w = int(parts[2]), parts[3]
                m = {"gate_proj": ("expert_gate", e),
                     "up_proj": ("expert_up", e),
                     "down_proj": ("expert_down", e)}
                if w in m:
                    target = (f"{p}/mlp/w_gate_up" if w != "down_proj"
                              else f"{p}/mlp/w_down")
                    return [(target, m[w], arr.T)]
        return super().map_hf_weight(name, arr)
