"""Llama 4 (Scout/Maverick-class) text decoder.

Behavioral reference: srt/models/llama4.py + HF modeling_llama4. Quirks
vs Llama 3:
- interleaved-pair (GPT-J style) rope, applied only on `no_rope_layers[i]
  == 1` layers; NoPE layers carry no positional rotation at all;
- NoPE layers use attention temperature tuning (arXiv 2501.19399): q is
  scaled by log1p(floor((pos+1)/floor_scale)) * attn_scale + 1;
- RoPE layers attend CHUNKED-locally (attention_chunk_size); NoPE layers
  attend globally (encoded as window = -chunk_size through the attention
  backends, ops/attention/xla_backend.py chunk masks);
- optional L2 qk-norm (unweighted, 16E model) after rope;
- MoE layers interleave with dense (interleave_moe_layer_step); routing
  is top-k over logits then SIGMOID weights multiplying the expert INPUT
  (FusedMoE scale_input), plus an always-on shared expert.

Token-identical to HF (tests/test_llama4.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.models.granite_moe_shared import _SharedMLP
from sglang_tpu.models.llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
)


def _llama4_route(logits: jax.Array, k: int):
    """HF Llama4Router: top-k over raw logits, sigmoid of the selected
    logits as the (input-scaling) weights."""
    topk_logits, topk_idx = jax.lax.top_k(logits, k)
    return jax.nn.sigmoid(topk_logits), topk_idx


class Llama4Attention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        hc = config.hf_config
        c = config
        n_layers = c.num_hidden_layers
        interval = int(getattr(hc, "no_rope_layer_interval", 4) or 4)
        no_rope = getattr(hc, "no_rope_layers", None)
        if not no_rope:
            no_rope = [int((i + 1) % interval != 0) for i in range(n_layers)]
        self.use_rope = bool(no_rope[layer_id])
        chunk = int(getattr(hc, "attention_chunk_size", 0) or 0)
        # RoPE layers are chunked-local; NoPE layers are global.
        layer_types = getattr(hc, "layer_types", None)
        chunked = (
            layer_types[layer_id] == "chunked_attention"
            if layer_types else self.use_rope
        )
        self.window = -chunk if (chunked and chunk) else 0
        self.use_qk_norm = bool(getattr(hc, "use_qk_norm", False))
        self.rms_eps = float(c.rms_norm_eps)
        self.attn_temperature_tuning = bool(
            getattr(hc, "attn_temperature_tuning", False)
        )
        self.floor_scale = float(getattr(hc, "floor_scale", 8192.0) or 8192.0)
        self.attn_scale = float(getattr(hc, "attn_scale", 0.1) or 0.1)
        self.rotary = RotaryEmbedding(
            self.hd, None, c.context_length, c.rope_theta, c.rope_scaling,
            interleaved=True,
        )
        self.qk_norm = None  # base-class weighted qk_norm unused

    def _l2norm(self, x):
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + self.rms_eps
        )
        return xf.astype(x.dtype)

    def apply_rotary(self, fb, q, k):
        if self.use_rope:
            q, k = self.rotary(fb.positions, q, k)
            if self.use_qk_norm:
                q = self._l2norm(q)
                k = self._l2norm(k)
        elif self.attn_temperature_tuning:
            pos = fb.positions.astype(jnp.float32)
            scales = (
                jnp.log1p(jnp.floor((pos + 1.0) / self.floor_scale))
                * self.attn_scale + 1.0
            )
            q = (q.astype(jnp.float32) * scales[:, None, None]).astype(
                q.dtype
            )
        return q, k


class Llama4Moe:
    """Routed experts (input-scaled sigmoid weights) + shared expert."""

    def __init__(self, config: ModelConfig):
        c = config
        hc = c.hf_config
        k = int(getattr(hc, "num_experts_per_tok", 1) or 1)
        self.moe = FusedMoE(
            num_experts=int(getattr(hc, "num_local_experts", 1)),
            top_k=k,
            hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            dtype=c.dtype,
            renormalize=False,
            route_fn=lambda logits: _llama4_route(logits, k),
            scale_input=True,
        )
        self.shared = _SharedMLP(c.hidden_size, c.intermediate_size, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = self.moe.specs(p)
        s.update(self.shared.specs(join(p, "shared")))
        return s

    def __call__(self, params, p, x, lora=None):
        return self.moe(params, p, x) + self.shared(
            params, join(p, "shared"), x
        )


class Llama4DecoderLayer(LlamaDecoderLayer):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        hc = config.hf_config
        self.attn = Llama4Attention(config, layer_id)
        n_layers = config.num_hidden_layers
        moe_layers = getattr(hc, "moe_layers", None)
        if moe_layers is None:
            step = int(getattr(hc, "interleave_moe_layer_step", 1) or 1)
            moe_layers = list(range(step - 1, n_layers, step))
        if layer_id in set(moe_layers):
            self.mlp = Llama4Moe(config)
        else:
            dense_cfg = type(config).__new__(type(config))
            dense_cfg.__dict__.update(config.__dict__)
            dense_cfg.intermediate_size = int(
                getattr(hc, "intermediate_size_mlp", config.intermediate_size)
            )
            self.mlp = LlamaMLP(dense_cfg, layer_id)


class Llama4ForCausalLM(LlamaForCausalLM):
    supports_pp = False  # heterogeneous (dense/MoE, rope/nope) layers

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            Llama4DecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]

    def map_hf_weight(self, name: str, arr: np.ndarray):
        pre = self.hf_prefix
        if name.startswith(f"{pre}.layers.") and ".feed_forward." in name:
            rest = name[len(pre) + 8 :]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}/mlp"
            sub = sub[len("feed_forward.") :]
            dense = {
                "gate_proj.weight": (f"{p}/gate_up/weight", 0),
                "up_proj.weight": (f"{p}/gate_up/weight", 1),
                "down_proj.weight": (f"{p}/down/weight", None),
            }
            if sub in dense:
                pname, slot = dense[sub]
                return [(pname, slot, arr.T)]
            if sub == "router.weight":
                return [(f"{p}/router", None, arr.T)]
            shared = {
                "shared_expert.gate_proj.weight":
                    (f"{p}/shared/gate_up/weight", 0),
                "shared_expert.up_proj.weight":
                    (f"{p}/shared/gate_up/weight", 1),
                "shared_expert.down_proj.weight":
                    (f"{p}/shared/down/weight", None),
            }
            if sub in shared:
                pname, slot = shared[sub]
                return [(pname, slot, arr.T)]
            if sub == "experts.gate_up_proj":
                # [E, H, 2I] with columns [gate | up]
                I = arr.shape[-1] // 2
                out = []
                for e in range(arr.shape[0]):
                    out.append((f"{p}/w_gate_up", ("expert_gate", e),
                                arr[e, :, :I]))
                    out.append((f"{p}/w_gate_up", ("expert_up", e),
                                arr[e, :, I:]))
                return out
            if sub == "experts.down_proj":
                # [E, I, H]
                return [
                    (f"{p}/w_down", ("expert_down", e), arr[e])
                    for e in range(arr.shape[0])
                ]
            return []
        return super().map_hf_weight(name, arr)
