"""Phi-3 (mini/small) decoder. Ref: srt/models/phi3_small.py + HF phi3.

Structurally Llama with FUSED checkpoint tensors: qkv_proj holds
[q; k; v] rows and gate_up_proj holds [gate; up] rows — split here into
the q_proj/kv_proj/gate_up slots. Longrope (su) scaling is not wired yet;
Phi-3-*-4k checkpoints (rope_scaling null) are supported.
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.models.llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):
    def map_hf_weight(self, name: str, arr: np.ndarray):
        c = self.config
        if name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}"
            if sub == "self_attn.qkv_proj.weight":
                nq = c.num_attention_heads * c.head_dim
                nk = c.num_key_value_heads * c.head_dim
                q, k, v = arr[:nq], arr[nq:nq + nk], arr[nq + nk:]
                return [
                    (f"{p}/attn/q_proj/weight", None, q.T),
                    (f"{p}/attn/kv_proj/weight", 0, k.T),
                    (f"{p}/attn/kv_proj/weight", 1, v.T),
                ]
            if sub == "mlp.gate_up_proj.weight":
                inter = c.intermediate_size
                return [
                    (f"{p}/mlp/gate_up/weight", 0, arr[:inter].T),
                    (f"{p}/mlp/gate_up/weight", 1, arr[inter:].T),
                ]
        return super().map_hf_weight(name, arr)
