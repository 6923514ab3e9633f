"""Cohere2 (Command R7B) decoder. Ref: srt/models/commandr.py lineage.

vs Llama: bias-free LayerNorm (mean-centered), a PARALLEL residual block
(x + attn(norm(x)) + mlp(norm(x)) from ONE shared norm), interleaved-pair
rope applied ONLY on sliding_attention layers (full-attention layers are
NoPE), tied embeddings with logits scaled by logit_scale. Tested
token-identical to HF.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import Params, SpecTree, join
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.deepseek_v2 import (
    _apply_interleaved_rope,
    _interleaved_rope_tables,
)
from sglang_tpu.models.llama import (
    LlamaAttention,
    LlamaForCausalLM,
    LlamaMLP,
)


class Cohere2Attention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        is_sliding = c.layer_is_sliding(layer_id)
        self.window = int(c.hf_config.sliding_window) if is_sliding else 0
        self.use_rope = is_sliding  # full-attention layers have NO rope
        self.cos, self.sin = _interleaved_rope_tables(
            self.hd, c.context_length, c.rope_theta, c.rope_scaling
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
        if self.use_rope:
            cos = self.cos[fb.positions]
            sin = self.sin[fb.positions]
            q = _apply_interleaved_rope(q, cos, sin)
            k = _apply_interleaved_rope(k, cos, sin)
        out, kv = attn_backend(
            q, k, v, self.layer_id, kv, fb, window=self.window
        )
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class Cohere2DecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        eps = getattr(c.hf_config, "layer_norm_eps", None) or c.rms_norm_eps
        self.attn = Cohere2Attention(c, layer_id)
        self.mlp = LlamaMLP(c, layer_id)
        self.input_norm = LayerNorm(c.hidden_size, eps, c.dtype, bias=False)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.input_norm.specs(join(p, "input_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = self.input_norm(params, join(p, "input_norm"), x)
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        m = self.mlp(params, join(p, "mlp"), h)
        return x + a + m, None, kv


class Cohere2ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        config.tie_word_embeddings = True  # cohere always ties
        super().__init__(config)
        c = config
        eps = getattr(c.hf_config, "layer_norm_eps", None) or c.rms_norm_eps
        self.decoder_layers = [
            Cohere2DecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = LayerNorm(c.hidden_size, eps, c.dtype, bias=False)
        self.logit_scale = float(getattr(c.hf_config, "logit_scale", 1.0))

    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        x = self.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def compute_logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        return super().compute_logits(params, hidden) * self.logit_scale
