"""IBM Granite-MoE (granitemoe, the 3.x "a"-series MoE models).

Behavioral reference: srt/models/granitemoe.py (HF modeling_granitemoe
as the parity oracle). Granite's four scalar multipliers (embedding /
attention / residual / logits) on top of a per-layer MoE whose gating is
top-k-then-softmax over the selected logits — FusedMoE's renormalize
formulation exactly. Expert weights ship fused: input_linear [E, 2I, H]
(rows [0:I]=gate, [I:2I]=up), output_linear [E, H, I]. Token-identical
to HF (tests/test_moe_models2.py).
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.models.granite import (
    GraniteDecoderLayer,
    GraniteForCausalLM,
)


class GraniteMoeForCausalLM(GraniteForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        self.decoder_layers = [
            GraniteDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        for layer in self.decoder_layers:
            layer.mlp = FusedMoE(
                num_experts=c.num_experts,
                top_k=c.num_experts_per_tok,
                hidden_size=c.hidden_size,
                intermediate_size=c.intermediate_size,
                dtype=c.dtype,
                renormalize=True,  # softmax over the top-k logits
            )

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if ".block_sparse_moe." in name:
            pre = self.hf_prefix
            rest = name[len(pre) + 8 :]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}/mlp"
            if sub == "block_sparse_moe.router.layer.weight":
                return [(f"{p}/router", None, arr.T)]
            E = self.config.num_experts
            if sub == "block_sparse_moe.input_linear.weight":
                # [E, 2I, H]: first I rows gate, next I rows up
                I = arr.shape[1] // 2
                out = []
                for e in range(E):
                    out.append((f"{p}/w_gate_up", ("expert_gate", e),
                                arr[e, :I, :].T))
                    out.append((f"{p}/w_gate_up", ("expert_up", e),
                                arr[e, I:, :].T))
                return out
            if sub == "block_sparse_moe.output_linear.weight":
                # [E, H, I] -> w_down rows [I, H]
                return [(f"{p}/w_down", ("expert_down", e), arr[e].T)
                        for e in range(E)]
            return []
        return super().map_hf_weight(name, arr)
