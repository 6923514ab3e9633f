"""InternVL 2/2.5/3 (InternViT + pixel-shuffle projector + Qwen2/Llama LM).

Behavioral reference: srt/models/internvl.py + HF
InternVLForConditionalGeneration numerics. The HF processor's dynamic
tiling is handled at the processor level (each tile is one tower pass);
the tower output drops CLS, pixel-shuffles 2x2 (downsample_ratio), and
projects through LN+MLP. Token parity: tests/test_internvl.py.
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.multimodal.vision_internvl import (
    InternVLProjector,
    InternVLVisionTower,
    pixel_shuffle,
)


class InternVLForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, config: ModelConfig):
        hf = config.hf_config
        # Qwen2/Qwen3 text backbones ride the Llama class (qk_norm etc.
        # configured via ModelConfig fields).
        if getattr(hf.text_config, "model_type", "") == "qwen3":
            config.qk_norm = True
        super().__init__(config)
        self.image_token_id = getattr(hf, "image_token_id", None)
        self.downsample = float(getattr(hf, "downsample_ratio", 0.5))
        self.vision = InternVLVisionTower(hf.vision_config, config.dtype)
        self.projector = InternVLProjector(hf, config.dtype)

    def param_specs(self):
        s = super().param_specs()
        s.update(self.vision.specs("vision"))
        s.update(self.projector.specs("projector"))
        return s

    def encode_images(self, params, pixel_values, grid_thw=None):
        feats = self.vision(params, "vision", pixel_values)[:, 1:]  # drop CLS
        B, n, c = feats.shape
        g = int(round(n ** 0.5))
        feats = feats.reshape(B, g, g, c)
        feats = pixel_shuffle(feats, self.downsample)
        feats = feats.reshape(B, -1, feats.shape[-1])
        return self.projector(params, "projector", feats)

    def mm_num_tokens(self, processed) -> int:
        return processed.num_tokens

    def map_hf_weight(self, name: str, arr: np.ndarray):
        for pre in ("model.vision_tower.", "vision_tower."):
            if name.startswith(pre):
                return self.vision.map_hf_weight(name[len(pre):], arr,
                                                 "vision")
        for pre in ("model.multi_modal_projector.", "multi_modal_projector."):
            if name.startswith(pre):
                rest = name[len(pre):]
                pname = "projector/" + rest.replace(".", "/")
                if rest.endswith("weight") and "norm" not in rest:
                    arr = arr.T
                return [(pname, None, arr)]
        if name.startswith("model.language_model."):
            return super().map_hf_weight(
                "model." + name[len("model.language_model."):], arr
            )
        if name.startswith("language_model."):
            return super().map_hf_weight(name[len("language_model."):], arr)
        return super().map_hf_weight(name, arr)
