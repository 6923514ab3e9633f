"""ERNIE 4.5 decoder (Baidu). Behavioral reference: HF modeling_ernie4_5
(srt/models/ernie.py lineage). Llama structure with GLM-style INTERLEAVED
rope over the full head dim (f32 rotation) and optional linear biases
(config.use_bias).
"""

from __future__ import annotations

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.deepseek_v2 import (
    _apply_interleaved_rope,
    _interleaved_rope_tables,
)
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


class Ernie45Attention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        self.cos, self.sin = _interleaved_rope_tables(
            self.hd, c.context_length, c.rope_theta, c.rope_scaling
        )

    def apply_rotary(self, fb: ForwardBatch, q, k):
        cos = self.cos[fb.positions]
        sin = self.sin[fb.positions]
        return (
            _apply_interleaved_rope(q, cos, sin),
            _apply_interleaved_rope(k, cos, sin),
        )


class Ernie45ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        # ernie flags biases as use_bias (applies to qkv AND o/mlp; the
        # common checkpoints ship use_bias=False, matching this wiring).
        config.attention_bias = bool(
            getattr(config.hf_config, "use_bias", False)
        )
        super().__init__(config)
        for i, layer in enumerate(self.decoder_layers):
            layer.attn = Ernie45Attention(config, i)
