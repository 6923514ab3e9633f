"""GLM family decoders: GLM-4 (glm), GLM-4-0414 (glm4).

Behavioral reference: srt/models/glm4.py (+ HF modeling_glm/modeling_glm4
as the parity oracle). vs Llama: QKV bias (no o_proj bias), partial
INTERLEAVED rotary (pairs (2i, 2i+1) of the first head_dim *
partial_rotary_factor dims), fused gate_up MLP. glm4 additionally wraps
attention and MLP outputs in post_self_attn / post_mlp RMSNorms
(sandwich, standard weights — not gemma 1+w). Token-identical to HF
(tests/test_glm_family.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.deepseek_v2 import (
    _apply_interleaved_rope,
    _interleaved_rope_tables,
)
from sglang_tpu.models.llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
)


class GlmAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        factor = float(
            getattr(c.hf_config, "partial_rotary_factor", 0.5) or 0.5
        )
        self.rotary_dim = int(self.hd * factor)
        self.cos, self.sin = _interleaved_rope_tables(
            self.rotary_dim, c.context_length, c.rope_theta, c.rope_scaling
        )

    def apply_rotary(self, fb: ForwardBatch, q, k):
        cos = self.cos[fb.positions]
        sin = self.sin[fb.positions]
        rd = self.rotary_dim

        def rot(x):
            out = _apply_interleaved_rope(x[..., :rd], cos, sin)
            return jnp.concatenate([out, x[..., rd:]], axis=-1)

        return rot(q), rot(k)


class GlmDecoderLayer(LlamaDecoderLayer):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        self.attn = GlmAttention(config, layer_id)


class GlmForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            GlmDecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]

    def map_hf_weight(self, name: str, arr: np.ndarray):
        # Fused gate_up checkpoint tensor -> both fusion slots.
        if ".mlp.gate_up_proj.weight" in name:
            pre = self.hf_prefix
            rest = name[len(pre) + 8 :]
            idx = rest.split(".", 1)[0]
            half = arr.shape[0] // 2
            p = f"layers/{idx}/mlp/gate_up/weight"
            return [(p, 0, arr[:half].T), (p, 1, arr[half:].T)]
        return super().map_hf_weight(name, arr)


class Glm4DecoderLayer(GlmDecoderLayer):
    """glm4 sandwich: extra norms on the attn/MLP OUTPUTS (pre-residual)."""

    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        self.post_self_attn_norm = RMSNorm(c.hidden_size, c.rms_norm_eps,
                                           c.dtype)
        self.post_mlp_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = super().specs(p)
        s.update(self.post_self_attn_norm.specs(join(p, "post_self_attn_norm")))
        s.update(self.post_mlp_norm.specs(join(p, "post_mlp_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        residual = x
        h = self.input_norm(params, join(p, "input_norm"), x)
        h, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        h = self.post_self_attn_norm(params, join(p, "post_self_attn_norm"), h)
        x = residual + h
        residual = x
        h = self.post_norm(params, join(p, "post_norm"), x)
        h = self.mlp(params, join(p, "mlp"), h)
        h = self.post_mlp_norm(params, join(p, "post_mlp_norm"), h)
        x = residual + h
        return x, None, kv


class Glm4ForCausalLM(GlmForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            Glm4DecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]

    def __call__(self, params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        # The sandwich layer keeps x fully added (no deferred-residual
        # protocol), so the trunk loop is plain.
        x = self.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if ".post_self_attn_layernorm.weight" in name:
            idx = name.split(".layers.")[1].split(".", 1)[0]
            return [(f"layers/{idx}/post_self_attn_norm/weight", None, arr)]
        if ".post_mlp_layernorm.weight" in name:
            idx = name.split(".layers.")[1].split(".", 1)[0]
            return [(f"layers/{idx}/post_mlp_norm/weight", None, arr)]
        return super().map_hf_weight(name, arr)
