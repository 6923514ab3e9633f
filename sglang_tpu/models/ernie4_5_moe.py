"""ERNIE 4.5 MoE (Baidu). Behavioral reference: srt/models/ernie.py MoE
lineage + HF modeling_ernie4_5_moe.

Ernie dense attention (interleaved rope, models/ernie4_5.py) plus MoE
layers on ((l+1) % moe_layer_interval == 0, l in [start, end]): f32
softmax scores, top-k SELECTED through a learned e_score_correction_bias
(moe_statics) while the combine weights stay un-biased, renormalized
with a clamp at moe_norm_min; optional shared experts. Token-identical
to HF (tests/test_model_zoo_r5b.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, SpecTree, join
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.models.ernie4_5 import Ernie45ForCausalLM
from sglang_tpu.models.granite_moe_shared import _SharedMLP


class Ernie45Moe:
    def __init__(self, config: ModelConfig):
        c = config
        hf = c.hf_config
        self.n_experts = int(getattr(hf, "moe_num_experts", 0))
        self.top_k = int(getattr(hf, "moe_k", 2))
        self.norm_min = float(getattr(hf, "moe_norm_min", 1e-12))
        inter = int(getattr(hf, "moe_intermediate_size",
                            c.intermediate_size))
        self.moe = FusedMoE(
            num_experts=self.n_experts, top_k=self.top_k,
            hidden_size=c.hidden_size, intermediate_size=inter,
            dtype=c.dtype,
        )
        n_shared = int(getattr(hf, "moe_num_shared_experts", 0) or 0)
        self.shared = (
            _SharedMLP(c.hidden_size, inter * n_shared, c.dtype)
            if n_shared else None
        )

    def specs(self, p: str) -> SpecTree:
        from jax.sharding import PartitionSpec as P

        s = self.moe.specs(p)
        s[join(p, "router_bias")] = ParamSpec(
            (self.n_experts,), jnp.float32, P(), init_scale=0.0
        )
        if self.shared is not None:
            s.update(self.shared.specs(join(p, "shared")))
        return s

    def __call__(self, params, p, x, lora=None):
        from sglang_tpu.eplb import maybe_record

        logits = jnp.dot(
            x.astype(jnp.float32),
            params[join(p, "router")].astype(jnp.float32),
        )
        weights = jax.nn.softmax(logits, axis=-1)  # [T, E]
        corrected = weights + params[join(p, "router_bias")][None, :]
        _, idx = jax.lax.top_k(corrected, self.top_k)
        w = jnp.take_along_axis(weights, idx, axis=-1)
        w = w / jnp.maximum(w.sum(axis=-1, keepdims=True), self.norm_min)
        maybe_record(p, idx, self.n_experts)
        idx = params[join(p, "eplb_log2phy")][idx]
        out = self.moe.compute_experts(params, p, x, w, idx)
        if self.shared is not None:
            out = out + self.shared(params, join(p, "shared"), x)
        return out


class Ernie45MoeForCausalLM(Ernie45ForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        interval = int(getattr(hf, "moe_layer_interval", 1) or 1)
        start = int(getattr(hf, "moe_layer_start_index", 0) or 0)
        end = int(getattr(hf, "moe_layer_end_index",
                          config.num_hidden_layers - 1))
        if end < 0:
            end = config.num_hidden_layers - 1
        for i, layer in enumerate(self.decoder_layers):
            if (i + 1) % interval == 0 and start <= i <= end:
                layer.mlp = Ernie45Moe(config)

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name.startswith("model.layers.") and ".mlp." in name:
            rest = name[len("model.layers."):]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}/mlp"
            if sub == "mlp.gate.weight":
                return [(f"{p}/router", None, arr.T)]
            if sub == "mlp.moe_statics.e_score_correction_bias":
                return [(f"{p}/router_bias", None, arr.reshape(-1))]
            shared = {
                "mlp.shared_experts.gate_proj.weight":
                    (f"{p}/shared/gate_up/weight", 0),
                "mlp.shared_experts.up_proj.weight":
                    (f"{p}/shared/gate_up/weight", 1),
                "mlp.shared_experts.down_proj.weight":
                    (f"{p}/shared/down/weight", None),
            }
            if sub in shared:
                pname, slot = shared[sub]
                return [(pname, slot, arr.T)]
            if sub.startswith("mlp.experts."):
                parts = sub.split(".")
                e, w = int(parts[2]), parts[3]
                m = {"gate_proj": ("expert_gate", e),
                     "up_proj": ("expert_up", e),
                     "down_proj": ("expert_down", e)}
                if w in m:
                    target = (f"{p}/w_gate_up" if w != "down_proj"
                              else f"{p}/w_down")
                    return [(target, m[w], arr.T)]
        return super().map_hf_weight(name, arr)
