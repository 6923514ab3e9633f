"""Gemma-3 (text) decoder. Ref: srt/models/gemma3_causal.py.

vs Gemma-2: per-head q/k RMSNorm (gemma-style 1+w), DUAL rope — sliding
layers use rope_local_base_freq, full-attention layers use rope_theta
(+optional linear scaling) — layer_types-driven 5:1 local/global pattern,
no attention softcaps. Sandwich norms and sqrt(hidden) embedding scaling
carry over from Gemma-2. Tested token-identical to HF.
"""

from __future__ import annotations

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.gemma2 import (
    Gemma2Attention,
    Gemma2DecoderLayer,
    Gemma2ForCausalLM,
)


class Gemma3Attention(Gemma2Attention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        hf = c.hf_config
        self.is_sliding = c.layer_is_sliding(layer_id)
        self.window = int(c.sliding_window or 0) if self.is_sliding else 0
        self.logit_cap = 0.0  # gemma3 drops attention softcapping
        if self.is_sliding:
            theta = float(getattr(hf, "rope_local_base_freq", 10000.0))
            scaling = None
        else:
            theta = float(c.rope_theta)
            scaling = c.rope_scaling
        self.rotary = RotaryEmbedding(
            self.hd, None, c.context_length, theta, scaling
        )
        self.qk_norm = RMSNorm(self.hd, c.rms_norm_eps, c.dtype,
                               gemma_style=True)

    def specs(self, p: str) -> SpecTree:
        s = super().specs(p)
        s.update(self.qk_norm.specs(join(p, "q_norm")))
        s.update(self.qk_norm.specs(join(p, "k_norm")))
        return s

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        T = x.shape[0]
        q = self.q_proj(params, join(p, "q_proj"), x).reshape(
            T, self.nq, self.hd
        )
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k = kv_new[:, 0, :].reshape(T, self.nk, self.hd)
        v = kv_new[:, 1, :].reshape(T, self.nk, self.hd)
        q = self.qk_norm(params, join(p, "q_norm"), q)
        k = self.qk_norm(params, join(p, "k_norm"), k)
        q, k = self.rotary(fb.positions, q, k)
        out, kv = attn_backend(
            q, k, v, self.layer_id, kv, fb,
            window=self.window, scale=self.scale,
        )
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class Gemma3DecoderLayer(Gemma2DecoderLayer):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        self.attn = Gemma3Attention(config, layer_id)


class Gemma3ForCausalLM(Gemma2ForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            Gemma3DecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]
        self.final_cap = 0.0  # gemma3 drops final logit softcapping

    def map_hf_weight(self, name: str, arr):
        if name.endswith("self_attn.q_norm.weight"):
            idx = name.split("layers.")[1].split(".")[0]
            return [(f"layers/{idx}/attn/q_norm/weight", None, arr)]
        if name.endswith("self_attn.k_norm.weight"):
            idx = name.split("layers.")[1].split(".")[0]
            return [(f"layers/{idx}/attn/k_norm/weight", None, arr)]
        return super().map_hf_weight(name, arr)
