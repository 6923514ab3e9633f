"""SmolLM3 decoder (HuggingFace).

Behavioral reference: HF modeling_smollm3 (srt/models lineage:
srt/models/smollm3.py). Llama structure with per-layer NoPE: rope is
applied only where config.no_rope_layers[i] == 1 (by default every 4th
layer is NoPE). Optional per-layer sliding windows via layer_types.
"""

from __future__ import annotations

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
)


class SmolLM3Attention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        hf = c.hf_config
        # no_rope_layers[i]: 1 -> rope, 0 -> NoPE (HF semantics).
        flags = getattr(hf, "no_rope_layers", None)
        self.use_rope = bool(flags[layer_id]) if flags else True
        self.window = 0
        if getattr(hf, "use_sliding_window", False) and c.sliding_window:
            if c.layer_is_sliding(layer_id):
                self.window = int(c.sliding_window)

    def apply_rotary(self, fb: ForwardBatch, q, k):
        if not self.use_rope:
            return q, k
        return self.rotary(fb.positions, q, k)


class SmolLM3ForCausalLM(LlamaForCausalLM):
    supports_pp = False  # per-layer NoPE flags -> heterogeneous

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        for i, layer in enumerate(self.decoder_layers):
            layer.attn = SmolLM3Attention(config, i)
