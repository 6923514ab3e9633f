"""Mixtral (MoE) decoder. Behavioral reference: srt/models/mixtral.py.

Llama attention + FusedMoE FFN; HF weight names:
model.layers.N.block_sparse_moe.{gate.weight, experts.E.w1/w2/w3.weight}.
w1=gate [I,H], w2=down [H,I], w3=up [I,H].
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.models.llama import LlamaDecoderLayer, LlamaForCausalLM


class MixtralDecoderLayer(LlamaDecoderLayer):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        self.mlp = FusedMoE(
            num_experts=config.num_experts,
            top_k=config.num_experts_per_tok,
            hidden_size=config.hidden_size,
            intermediate_size=config.intermediate_size,
            dtype=config.dtype,
            renormalize=True,
        )


class MixtralForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            MixtralDecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]

    def map_hf_weight(self, name: str, arr: np.ndarray):
        pre = self.hf_prefix
        if ".block_sparse_moe." in name:
            rest = name[len(pre) + 8 :]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}/mlp"
            if sub == "block_sparse_moe.gate.weight":
                return [(f"{p}/router", None, arr.T)]
            # block_sparse_moe.experts.E.wN.weight
            parts = sub.split(".")
            e = int(parts[2])
            w = parts[3]
            if w == "w1":  # gate [I, H] -> [H, I] at [e, :, 0, :]
                return [(f"{p}/w_gate_up", ("expert_gate", e), arr.T)]
            if w == "w3":  # up
                return [(f"{p}/w_gate_up", ("expert_up", e), arr.T)]
            if w == "w2":  # down [H, I] -> [I, H] at [e]
                return [(f"{p}/w_down", ("expert_down", e), arr.T)]
            return []
        return super().map_hf_weight(name, arr)
