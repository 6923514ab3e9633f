"""IBM Granite-MoE-Shared (granite 3.1+ "a"-series with a shared expert).

Behavioral reference: srt/models/granitemoe.py + HF
modeling_granitemoeshared: GraniteMoe routing plus a dense shared MLP
whose output ADDS to the MoE output before the scaled residual
(HF GraniteMoeSharedDecoderLayer.forward). Shared weights ship fused:
input_linear [2I_s, H] (rows [0:I_s]=gate, [I_s:]=up), output_linear
[H, I_s]. Token-identical to HF (tests/test_model_zoo_r5.py).
"""

from __future__ import annotations

import jax
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.linear import FusedColumnLinear, RowParallelLinear
from sglang_tpu.models.granite_moe import GraniteMoeForCausalLM


class _SharedMLP:
    """Dense gated MLP with its own intermediate size (the shared
    expert); summed with the routed MoE output."""

    def __init__(self, hidden: int, inter: int, dtype):
        self.gate_up = FusedColumnLinear(hidden, 2, inter, dtype)
        self.down = RowParallelLinear(inter, hidden, dtype)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.gate_up.specs(join(p, "gate_up")))
        s.update(self.down.specs(join(p, "down")))
        return s

    def __call__(self, params, p, x):
        gu = self.gate_up(params, join(p, "gate_up"), x)
        h = jax.nn.silu(gu[:, 0, :]) * gu[:, 1, :]
        return self.down(params, join(p, "down"), h)


class _MoEPlusShared:
    def __init__(self, moe, shared: _SharedMLP):
        self.moe = moe
        self.shared = shared

    def specs(self, p: str) -> SpecTree:
        s = self.moe.specs(p)
        s.update(self.shared.specs(join(p, "shared")))
        return s

    def __call__(self, params, p, x, lora=None):
        return self.moe(params, p, x) + self.shared(
            params, join(p, "shared"), x
        )


class GraniteMoeSharedForCausalLM(GraniteMoeForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        inter = int(getattr(c.hf_config, "shared_intermediate_size", 0) or 0)
        if inter:
            for layer in self.decoder_layers:
                layer.mlp = _MoEPlusShared(
                    layer.mlp,
                    _SharedMLP(c.hidden_size, inter, c.dtype),
                )

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if ".shared_mlp." in name:
            pre = self.hf_prefix
            rest = name[len(pre) + 8 :]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}/mlp/shared"
            if sub == "shared_mlp.input_linear.weight":
                half = arr.shape[0] // 2
                return [
                    (f"{p}/gate_up/weight", 0, arr[:half].T),
                    (f"{p}/gate_up/weight", 1, arr[half:].T),
                ]
            if sub == "shared_mlp.output_linear.weight":
                return [(f"{p}/down/weight", None, arr.T)]
            return []
        return super().map_hf_weight(name, arr)
