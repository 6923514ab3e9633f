"""Qwen2-Audio: Whisper-style audio encoder + Qwen2 LM.

Behavioral ref: srt/models/qwen2_audio.py + HF
Qwen2AudioForConditionalGeneration numerics. Audio features (whisper
log-mel, multimodal/audio.py) run through the jitted encoder tower once
per clip; the resulting embeddings are injected at `<|AUDIO|>`
placeholder positions through the LM's input_embeds path — the exact
mechanism the VLM families use, so the scheduler's mm-embedding cache
and mm-hash radix keys work unchanged for audio.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.multimodal.audio_whisper import WhisperEncoderTower


class Qwen2AudioForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, config: ModelConfig):
        config.attention_bias = True  # Qwen2 LM: qkv bias
        super().__init__(config)
        hf = config.hf_config
        self.audio_token_id = getattr(
            hf, "audio_token_id", getattr(hf, "audio_token_index", None)
        )
        self.audio_tower = WhisperEncoderTower(
            hf.audio_config, config.hidden_size, config.dtype
        )

    def param_specs(self):
        s = super().param_specs()
        s.update(self.audio_tower.specs("audio"))
        return s

    def encode_images(self, params, pixel_values: jax.Array,
                      grid_thw=None) -> jax.Array:
        """Audio 'images': pixel_values [n_mels, 3000] mel features;
        grid_thw = (num_real_frames,). Returns [750, H]; the scheduler
        slices the first num_tokens rows (valid post-pool frames)."""
        feat_len = jnp.int32(grid_thw[0] if grid_thw is not None
                             else pixel_values.shape[-1])
        return self.audio_tower(
            params, "audio", jnp.asarray(pixel_values), feat_len
        )

    def map_hf_weight(self, name: str, arr: np.ndarray):
        for pre in ("model.audio_tower.", "audio_tower."):
            if name.startswith(pre):
                return self.audio_tower.map_hf_weight(
                    name[len(pre):], arr, "audio"
                )
        for pre in ("model.multi_modal_projector.linear.",
                    "multi_modal_projector.linear."):
            if name.startswith(pre):
                sub = name[len(pre):]
                if sub == "weight":
                    return [("audio/proj/weight", None, arr.T)]
                if sub == "bias":
                    return [("audio/proj/bias", None, arr)]
        for pre in ("language_model.model.", "model.language_model."):
            if name.startswith(pre):
                return super().map_hf_weight("model." + name[len(pre):], arr)
        if name.startswith("language_model.lm_head."):
            return super().map_hf_weight(
                "lm_head." + name[len("language_model.lm_head."):], arr
            )
        return super().map_hf_weight(name, arr)
