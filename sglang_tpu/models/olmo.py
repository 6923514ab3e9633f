"""OLMo (v1) decoder. Ref: srt/models/olmo.py.

vs Llama: NON-PARAMETRIC LayerNorm (no weight/bias, eps 1e-5), optional
clip_qkv clamping on the q/k/v projections, tied embeddings optional.
Tested token-identical to HF.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import Params, SpecTree, join
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import (
    LlamaAttention,
    LlamaForCausalLM,
    LlamaMLP,
)


def _nonparam_layer_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    orig = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(orig)


class OlmoAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        self.clip_qkv = getattr(config.hf_config, "clip_qkv", None)

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        T = x.shape[0]
        q_flat = self.q_proj(params, join(p, "q_proj"), x)
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k_flat = kv_new[:, 0, :]
        v_flat = kv_new[:, 1, :]
        if self.clip_qkv is not None:
            c = float(self.clip_qkv)
            q_flat = jnp.clip(q_flat, -c, c)
            k_flat = jnp.clip(k_flat, -c, c)
            v_flat = jnp.clip(v_flat, -c, c)
        q = q_flat.reshape(T, self.nq, self.hd)
        k = k_flat.reshape(T, self.nk, self.hd)
        v = v_flat.reshape(T, self.nk, self.hd)
        q, k = self.rotary(fb.positions, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class OlmoDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        self.attn = OlmoAttention(config, layer_id)
        self.mlp = LlamaMLP(config, layer_id)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = _nonparam_layer_norm(x)
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = x + a
        h = _nonparam_layer_norm(x)
        x = x + self.mlp(params, join(p, "mlp"), h)
        return x, None, kv


class OlmoForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            OlmoDecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]

    def param_specs(self) -> SpecTree:
        s = super().param_specs()
        s.pop("final_norm/weight", None)  # non-parametric final norm
        return s

    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        x = self.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        return _nonparam_layer_norm(x), kv
