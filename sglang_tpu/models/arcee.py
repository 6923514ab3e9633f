"""Arcee AFM decoder. Behavioral reference: HF modeling_arcee
(srt/models/arcee.py lineage). Llama structure with an UN-gated MLP:
down(relu(up(x))^2) — no gate projection.
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import ACT_SINGLE
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.linear import ColumnParallelLinear, RowParallelLinear
from sglang_tpu.models.llama import LlamaForCausalLM


class UpOnlyMLP:
    """down(act(up(x))) — Arcee/Nemotron-style un-gated MLP."""

    def __init__(self, config: ModelConfig, layer_id: int = 0):
        c = config
        self.up = ColumnParallelLinear(c.hidden_size, c.intermediate_size,
                                       c.dtype)
        self.down = RowParallelLinear(c.intermediate_size, c.hidden_size,
                                      c.dtype)
        self.act = ACT_SINGLE[c.hidden_act]

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.up.specs(join(p, "up")))
        s.update(self.down.specs(join(p, "down")))
        return s

    def __call__(self, params, p, x, lora=None):
        h = self.act(self.up(params, join(p, "up"), x))
        return self.down(params, join(p, "down"), h)


class ArceeForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        for i, layer in enumerate(self.decoder_layers):
            layer.mlp = UpOnlyMLP(config, i)

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if ".mlp.up_proj.weight" in name:
            idx = name.split(".layers.")[1].split(".", 1)[0]
            return [(f"layers/{idx}/mlp/up/weight", None, arr.T)]
        if ".mlp.down_proj.weight" in name:
            idx = name.split(".layers.")[1].split(".", 1)[0]
            return [(f"layers/{idx}/mlp/down/weight", None, arr.T)]
        return super().map_hf_weight(name, arr)
