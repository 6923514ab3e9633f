"""Gemma (v1) decoder. Ref: srt/models/gemma.py.

Gemma-1 vs Llama: gemma-style RMSNorm (1+w), embedding scaled by
sqrt(hidden), gelu-tanh MLP, tied lm_head, head_dim from config (256).
Unlike Gemma-2 there are no sandwich norms, softcaps, or sliding windows.
Greedy decode is token-identical to HF (tests/test_gemma.py).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import gelu_tanh_and_mul
from sglang_tpu.layers.base import Params, SpecTree, join
from sglang_tpu.layers.embedding import LMHead, VocabEmbedding
from sglang_tpu.layers.linear import FusedColumnLinear, RowParallelLinear
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


class GemmaDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        self.attn = LlamaAttention(c, layer_id)
        self.gate_up = FusedColumnLinear(c.hidden_size, 2,
                                         c.intermediate_size, c.dtype)
        self.down = RowParallelLinear(c.intermediate_size, c.hidden_size,
                                      c.dtype)
        mk = lambda: RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype,
                             gemma_style=True)
        self.input_norm = mk()
        self.post_norm = mk()

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.gate_up.specs(join(p, "mlp/gate_up")))
        s.update(self.down.specs(join(p, "mlp/down")))
        s.update(self.input_norm.specs(join(p, "input_norm")))
        s.update(self.post_norm.specs(join(p, "post_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        if residual is None:
            residual = x
        h = self.input_norm(params, join(p, "input_norm"), x)
        h, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = residual + h
        residual = x
        h = self.post_norm(params, join(p, "post_norm"), x)
        h = gelu_tanh_and_mul(self.gate_up(params, join(p, "mlp/gate_up"), h))
        h = self.down(params, join(p, "mlp/down"), h)
        x = residual + h
        return x, None, kv


class GemmaForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        c.tie_word_embeddings = True  # gemma always ties
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.decoder_layers = [
            GemmaDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype,
                                  gemma_style=True)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, c.dtype)
        self.embed_scale = math.sqrt(c.hidden_size)

    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        x = self.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        x = x * jnp.asarray(self.embed_scale, x.dtype)
        residual = None
        for i, layer in enumerate(self.decoder_layers):
            x, residual, kv = layer(
                params, f"layers/{i}", x, residual, fb, kv, attn_backend
            )
        x = self.final_norm(params, "final_norm", x)
        return x, kv
