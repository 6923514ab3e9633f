"""LLaVA (CLIP ViT + projector + Llama-family LM).

Behavioral reference: srt/models/llava.py + HF
LlavaForConditionalGeneration numerics. The vision tower runs under jit
as a dense 577-token transformer (multimodal/vision_clip.py); its
projected features are injected at the image-placeholder positions via
the LM's input_embeds path (mm_utils analog), so the paged/radix
machinery is untouched — image identity enters the prefix key as
mm_hashes.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.multimodal.vision_clip import CLIPVisionTower, LlavaProjector
from sglang_tpu.models.llama import LlamaForCausalLM


class LlavaForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        vc = hf.vision_config
        self.image_token_id = getattr(hf, "image_token_index", None)
        feature_layer = getattr(hf, "vision_feature_layer", -2)
        self.select_strategy = getattr(
            hf, "vision_feature_select_strategy", "default"
        )
        self.vision = CLIPVisionTower(vc, config.dtype, feature_layer)
        self.projector = LlavaProjector(
            vc.hidden_size, config.hidden_size, config.dtype,
            act=getattr(hf, "projector_hidden_act", "gelu"),
        )

    def param_specs(self):
        s = super().param_specs()
        s.update(self.vision.specs("vision"))
        s.update(self.projector.specs("projector"))
        return s

    # ---- vision encode (called by the scheduler at admission) ----
    def encode_images(self, params, pixel_values: jax.Array,
                      grid_thw=None) -> jax.Array:
        """pixel_values [B, 3, S, S] -> [B, tokens_per_image, H]."""
        feats = self.vision(params, "vision", pixel_values)
        if self.select_strategy == "default":
            feats = feats[:, 1:]  # drop CLS
        return self.projector(params, "projector", feats)

    def mm_num_tokens(self, processed) -> int:
        return processed.num_tokens

    # ---- HF weight mapping ----
    def map_hf_weight(self, name: str, arr: np.ndarray):
        # transformers >= 4.52 layout: model.{vision_tower,multi_modal_
        # projector,language_model}.* + lm_head; older: vision_tower.*,
        # language_model.model.*, language_model.lm_head.
        for pre in ("model.vision_tower.vision_model.",
                    "vision_tower.vision_model."):
            if name.startswith(pre):
                return self.vision.map_hf_weight(name[len(pre):], arr,
                                                 "vision")
        for pre in ("model.multi_modal_projector.", "multi_modal_projector."):
            if name.startswith(pre):
                rest = name[len(pre):]  # linear_1.weight etc
                pname = "projector/" + rest.replace(".", "/")
                if rest.endswith("weight"):
                    arr = arr.T
                return [(pname, None, arr)]
        if name.startswith("model.language_model."):
            return super().map_hf_weight(
                "model." + name[len("model.language_model."):], arr
            )
        if name.startswith("language_model.model."):
            return super().map_hf_weight(
                "model." + name[len("language_model.model."):], arr
            )
        if name == "language_model.lm_head.weight":
            return super().map_hf_weight("lm_head.weight", arr)
        if name == "lm_head.weight":
            return super().map_hf_weight(name, arr)
        return []
