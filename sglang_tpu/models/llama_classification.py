"""Llama / Qwen2 sequence-classification (reward) models.

Behavioral reference: srt/models/llama_classification.py + HF
LlamaForSequenceClassification numerics: the causal trunk with a
`score` linear head applied at the last token. Served through the
encode path; /classify returns the raw class logits (no L2 norm).
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec
from sglang_tpu.models.llama import LlamaForCausalLM


class LlamaForSequenceClassification(LlamaForCausalLM):
    is_classifier = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.num_labels = int(getattr(hf, "num_labels", 2))

    def param_specs(self):
        s = super().param_specs()
        # no lm_head; the classifier head replaces it
        s.pop("lm_head/weight", None)
        c = self.config
        s["score/weight"] = ParamSpec(
            (c.hidden_size, self.num_labels), c.dtype
        )
        return s

    def classify_logits(self, params, pooled):
        """[B, H] last-token hidden -> [B, num_labels] logits."""
        return pooled @ params["score/weight"]

    def compute_logits(self, params, hidden):
        raise ValueError(
            "classification model: use /classify (encode path), "
            "not generation"
        )

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name == "score.weight":
            return [("score/weight", None, arr.T)]
        if name == "lm_head.weight":
            return []
        return super().map_hf_weight(name, arr)
