"""IBM Granite decoder. Ref: srt/models/granite.py.

Llama structure plus four scalar multipliers from the config:
embedding_multiplier (on the input embeddings), attention_multiplier
(replaces 1/sqrt(head_dim)), residual_multiplier (scales every sublayer
output before the residual add), and logits_scaling (divides the final
logits). Tested token-identical to HF.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import Params, join
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
)


class GraniteAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        self.attn_scale = float(
            getattr(config.hf_config, "attention_multiplier", None)
            or self.hd ** -0.5
        )

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        T = x.shape[0]
        q = self.q_proj(params, join(p, "q_proj"), x).reshape(
            T, self.nq, self.hd
        )
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k = kv_new[:, 0, :].reshape(T, self.nk, self.hd)
        v = kv_new[:, 1, :].reshape(T, self.nk, self.hd)
        q, k = self.rotary(fb.positions, q, k)
        out, kv = attn_backend(
            q, k, v, self.layer_id, kv, fb, scale=self.attn_scale
        )
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class GraniteDecoderLayer(LlamaDecoderLayer):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        self.attn = GraniteAttention(config, layer_id)
        self.res_mult = float(
            getattr(config.hf_config, "residual_multiplier", 1.0) or 1.0
        )

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = self.input_norm(params, join(p, "input_norm"), x)
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = x + a * jnp.asarray(self.res_mult, a.dtype)
        h = self.post_norm(params, join(p, "post_norm"), x)
        m = self.mlp(params, join(p, "mlp"), h)
        x = x + m * jnp.asarray(self.res_mult, m.dtype)
        return x, None, kv


class GraniteForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            GraniteDecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]
        hf = config.hf_config
        self.embed_mult = float(getattr(hf, "embedding_multiplier", 1.0) or 1.0)
        self.logits_scale = float(getattr(hf, "logits_scaling", 1.0) or 1.0)

    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        x = self.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        x = x * jnp.asarray(self.embed_mult, x.dtype)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def compute_logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        return super().compute_logits(params, hidden) / self.logits_scale
