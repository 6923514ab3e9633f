"""Tencent HunYuan v1 (dense + MoE).

Behavioral reference: srt/models/hunyuan.py + HF
modeling_hunyuan_v1_{dense,moe}. Llama structure plus per-head q/k
RMSNorm applied AFTER rope, and (MoE) softmax-topk-renormalize routing
with an always-on shared MLP. num_experts / moe_topk may be per-layer
lists. Token-identical to HF (tests/test_model_zoo_r5b.py).
"""

from __future__ import annotations

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import join
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.models.granite_moe_shared import _MoEPlusShared, _SharedMLP
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


def _per_layer(v, layer_id: int) -> int:
    return int(v[layer_id]) if isinstance(v, (list, tuple)) else int(v)


class HunYuanAttention(LlamaAttention):
    """q/k head RMSNorm AFTER rope (HF applies rotary first)."""

    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        # NOT self.qk_norm: the base class applies that BEFORE rope.
        self.post_rope_norm = RMSNorm(self.hd, config.rms_norm_eps,
                                      config.dtype)
        self._ctx = None  # (params, prefix) bound per call

    def specs(self, p: str):
        s = super().specs(p)
        s.update(self.post_rope_norm.specs(join(p, "q_norm")))
        s.update(self.post_rope_norm.specs(join(p, "k_norm")))
        return s

    def apply_rotary(self, fb, q, k):
        q, k = self.rotary(fb.positions, q, k)
        params, p = self._ctx
        q = self.post_rope_norm(params, join(p, "q_norm"), q)
        k = self.post_rope_norm(params, join(p, "k_norm"), k)
        return q, k

    def __call__(self, params, p, x, fb, kv, attn_backend, lora=None):
        self._ctx = (params, p)
        return super().__call__(params, p, x, fb, kv, attn_backend,
                                lora=lora)


class HunYuanDenseV1ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        config.qk_norm = False
        super().__init__(config)
        for i, layer in enumerate(self.decoder_layers):
            layer.attn = HunYuanAttention(config, i)

    def map_hf_weight(self, name: str, arr):
        if name.endswith("self_attn.query_layernorm.weight"):
            idx = name.split("layers.")[1].split(".")[0]
            return [(f"layers/{idx}/attn/q_norm/weight", None, arr)]
        if name.endswith("self_attn.key_layernorm.weight"):
            idx = name.split("layers.")[1].split(".")[0]
            return [(f"layers/{idx}/attn/k_norm/weight", None, arr)]
        return super().map_hf_weight(name, arr)


class HunYuanMoEV1ForCausalLM(HunYuanDenseV1ForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        for i, layer in enumerate(self.decoder_layers):
            n_exp = _per_layer(getattr(hf, "num_experts", 1), i)
            top_k = _per_layer(getattr(hf, "moe_topk", 1), i)
            moe = FusedMoE(
                num_experts=n_exp, top_k=top_k,
                hidden_size=config.hidden_size,
                intermediate_size=config.intermediate_size,
                dtype=config.dtype, renormalize=True,
            )
            layer.mlp = _MoEPlusShared(
                moe,
                _SharedMLP(config.hidden_size, config.intermediate_size,
                           config.dtype),
            )

    def map_hf_weight(self, name: str, arr):
        if ".mlp." in name and name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}/mlp"
            if sub == "mlp.gate.wg.weight":
                return [(f"{p}/router", None, arr.T)]
            shared = {
                "mlp.shared_mlp.gate_proj.weight":
                    (f"{p}/shared/gate_up/weight", 0),
                "mlp.shared_mlp.up_proj.weight":
                    (f"{p}/shared/gate_up/weight", 1),
                "mlp.shared_mlp.down_proj.weight":
                    (f"{p}/shared/down/weight", None),
            }
            if sub in shared:
                pname, slot = shared[sub]
                return [(pname, slot, arr.T)]
            if sub.startswith("mlp.experts."):
                parts = sub.split(".")
                e, w = int(parts[2]), parts[3]
                slot = {"gate_proj": ("expert_gate", e),
                        "up_proj": ("expert_up", e),
                        "down_proj": ("expert_down", e)}[w]
                pname = (f"{p}/w_down" if w == "down_proj"
                         else f"{p}/w_gate_up")
                return [(pname, slot, arr.T)]
            return []
        return super().map_hf_weight(name, arr)
