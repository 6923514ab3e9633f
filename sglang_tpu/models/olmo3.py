"""OLMo-3: OLMo-2 post-norm structure + per-layer sliding windows.

Behavioral reference: HF Olmo3ForCausalLM — identical block to OLMo-2
(flat q/k RMSNorm before rope, post-norm residuals) with
layer_types[i] choosing sliding_attention (window) vs full_attention.
"""

from __future__ import annotations

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.models.olmo2 import (
    Olmo2Attention,
    Olmo2DecoderLayer,
    Olmo2ForCausalLM,
)


class Olmo3DecoderLayer(Olmo2DecoderLayer):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        hf = config.hf_config
        types = getattr(hf, "layer_types", None) or []
        is_sliding = (layer_id < len(types)
                      and types[layer_id] == "sliding_attention")
        if is_sliding:
            if getattr(hf, "sliding_window", None):
                self.attn.window = int(hf.sliding_window)
            # Sliding layers use the DEFAULT rope; only full-attention
            # layers apply config.rope_scaling (HF Olmo3Model.rotary_embs).
            if config.rope_scaling:
                from sglang_tpu.layers.rotary import RotaryEmbedding

                self.attn.rotary = RotaryEmbedding(
                    config.head_dim, None, config.context_length,
                    config.rope_theta, None,
                )


class Olmo3ForCausalLM(Olmo2ForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            Olmo3DecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]
