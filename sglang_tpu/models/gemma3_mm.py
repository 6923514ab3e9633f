"""Gemma 3 multimodal (SigLIP tower + avg-pool projector + Gemma3 LM).

Behavioral reference: srt/models/gemma3_mm.py + HF
Gemma3ForConditionalGeneration numerics. Image soft tokens are injected
AFTER the sqrt(hidden) embedding scaling (HF scales only the token
embeddings, not the projected image features), so this overrides the
Gemma2 forward's pre-scale injection point.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.models.gemma3 import Gemma3ForCausalLM
from sglang_tpu.multimodal.vision_siglip import (
    Gemma3Projector,
    SiglipVisionTower,
)


class Gemma3ForConditionalGeneration(Gemma3ForCausalLM):
    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.image_token_id = getattr(hf, "image_token_index", None)
        self.vision = SiglipVisionTower(hf.vision_config, config.dtype)
        self.projector = Gemma3Projector(hf, self.vision, config.dtype)

    def param_specs(self):
        s = super().param_specs()
        s.update(self.vision.specs("vision"))
        s.update(self.projector.specs("projector"))
        return s

    def encode_images(self, params, pixel_values, grid_thw=None):
        feats = self.vision(params, "vision", pixel_values)
        return self.projector(params, "projector", feats)

    def mm_num_tokens(self, processed) -> int:
        return processed.num_tokens

    def __call__(self, params, fb, kv, attn_backend, lora=None,
                 input_embeds=None, embed_mask=None):
        x = self.embed(params, "embed", fb.input_ids)
        x = x * jnp.asarray(self.embed_scale, x.dtype)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        residual = None
        for i, layer in enumerate(self.decoder_layers):
            x, residual, kv = layer(
                params, f"layers/{i}", x, residual, fb, kv, attn_backend
            )
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def map_hf_weight(self, name: str, arr: np.ndarray):
        for pre in ("model.vision_tower.vision_model.",
                    "vision_tower.vision_model."):
            if name.startswith(pre):
                return self.vision.map_hf_weight(name[len(pre):], arr,
                                                 "vision")
        for pre in ("model.multi_modal_projector.", "multi_modal_projector."):
            if name.startswith(pre):
                rest = name[len(pre):]
                if rest == "mm_input_projection_weight":
                    return [("projector/mm_input_projection_weight",
                             None, arr)]
                if rest == "mm_soft_emb_norm.weight":
                    return [("projector/mm_soft_emb_norm/weight", None, arr)]
                return []
        if name.startswith("model.language_model."):
            return super().map_hf_weight(
                "model." + name[len("model.language_model."):], arr
            )
        if name.startswith("language_model."):
            return super().map_hf_weight(name[len("language_model."):], arr)
        return super().map_hf_weight(name, arr)
