"""OLMoE (AI2 open MoE).

Behavioral reference: srt/models/olmoe.py (HF modeling_olmoe as the
parity oracle). vs Llama: FULL-WIDTH q/k RMSNorms (over nq*hd / nk*hd,
applied before the head reshape — not Qwen3's per-head norms), and every
layer is MoE: softmax router, top-k, optional renormalize
(norm_topk_prob) — which maps exactly onto FusedMoE's renormalize flag.
Token-identical to HF (tests/test_moe_models2.py).
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


class OlmoeAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        self.full_q_norm = RMSNorm(self.nq * self.hd, c.rms_norm_eps, c.dtype)
        self.full_k_norm = RMSNorm(self.nk * self.hd, c.rms_norm_eps, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = super().specs(p)
        s.update(self.full_q_norm.specs(join(p, "q_norm")))
        s.update(self.full_k_norm.specs(join(p, "k_norm")))
        return s

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        T = x.shape[0]
        q_flat = self.q_proj(params, join(p, "q_proj"), x)
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        # full-width norms BEFORE the head split (HF OlmoeAttention)
        q_flat = self.full_q_norm(params, join(p, "q_norm"), q_flat)
        k_flat = self.full_k_norm(params, join(p, "k_norm"), kv_new[:, 0, :])
        q = q_flat.reshape(T, self.nq, self.hd)
        k = k_flat.reshape(T, self.nk, self.hd)
        v = kv_new[:, 1, :].reshape(T, self.nk, self.hd)
        q, k = self.rotary(fb.positions, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class OlmoeForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        hf = c.hf_config
        renorm = bool(getattr(hf, "norm_topk_prob", False))
        for i, layer in enumerate(self.decoder_layers):
            layer.attn = OlmoeAttention(c, i)
            layer.mlp = FusedMoE(
                num_experts=c.num_experts,
                top_k=c.num_experts_per_tok,
                hidden_size=c.hidden_size,
                intermediate_size=c.intermediate_size,
                dtype=c.dtype,
                renormalize=renorm,
            )

    def map_hf_weight(self, name: str, arr: np.ndarray):
        pre = self.hf_prefix
        if ".mlp." in name:
            rest = name[len(pre) + 8 :]
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
                target = f"{p}/w_gate_up" if w != "down_proj" else f"{p}/w_down"
                return [(target, m[w], arr.T)]
            return []
        # full-width q/k norms share the llama q_norm/k_norm param names
        return super().map_hf_weight(name, arr)
