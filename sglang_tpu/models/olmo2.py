"""OLMo-2 decoder. Ref: srt/models/olmo2.py.

vs Llama: post-norm residual structure (x + norm(attn(x)), then
h + norm(mlp(h))) and RMSNorm applied to the FLAT q/k projections before
rope (whole projection width, not per-head). Weights otherwise map like
Llama; tested token-identical to HF.
"""

from __future__ import annotations

from typing import Tuple

import jax

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import Params, SpecTree, join
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import (
    LlamaAttention,
    LlamaForCausalLM,
    LlamaMLP,
)


class Olmo2Attention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        # Norms over the flat projections (nq*hd / nk*hd wide).
        self.flat_q_norm = RMSNorm(self.nq * self.hd, c.rms_norm_eps, c.dtype)
        self.flat_k_norm = RMSNorm(self.nk * self.hd, c.rms_norm_eps, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = super().specs(p)
        s.update(self.flat_q_norm.specs(join(p, "q_norm")))
        s.update(self.flat_k_norm.specs(join(p, "k_norm")))
        return s

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        T = x.shape[0]
        q_flat = self.q_proj(params, join(p, "q_proj"), x)
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        q_flat = self.flat_q_norm(params, join(p, "q_norm"), q_flat)
        k_flat = self.flat_k_norm(params, join(p, "k_norm"), kv_new[:, 0, :])
        v_flat = kv_new[:, 1, :]
        q = q_flat.reshape(T, self.nq, self.hd)
        k = k_flat.reshape(T, self.nk, self.hd)
        v = v_flat.reshape(T, self.nk, self.hd)
        q, k = self.rotary(fb.positions, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb,
                               window=self.window)
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class Olmo2DecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        self.attn = Olmo2Attention(c, layer_id)
        self.mlp = LlamaMLP(c, layer_id)
        self.post_attn_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.post_ffn_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.post_attn_norm.specs(join(p, "post_attn_norm")))
        s.update(self.post_ffn_norm.specs(join(p, "post_ffn_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h, kv = self.attn(params, join(p, "attn"), x, fb, kv, attn_backend)
        x = x + self.post_attn_norm(params, join(p, "post_attn_norm"), h)
        h = self.mlp(params, join(p, "mlp"), x)
        x = x + self.post_ffn_norm(params, join(p, "post_ffn_norm"), h)
        return x, None, kv


class Olmo2ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            Olmo2DecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]

    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        import jax.numpy as jnp

        x = self.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def map_hf_weight(self, name: str, arr):
        # q/k norms are flat-width; post-norm names differ from llama.
        if name.endswith("self_attn.q_norm.weight"):
            idx = name.split("layers.")[1].split(".")[0]
            return [(f"layers/{idx}/attn/q_norm/weight", None, arr)]
        if name.endswith("self_attn.k_norm.weight"):
            idx = name.split("layers.")[1].split(".")[0]
            return [(f"layers/{idx}/attn/k_norm/weight", None, arr)]
        if name.endswith("post_attention_layernorm.weight"):
            idx = name.split("layers.")[1].split(".")[0]
            return [(f"layers/{idx}/post_attn_norm/weight", None, arr)]
        if name.endswith("post_feedforward_layernorm.weight"):
            idx = name.split("layers.")[1].split(".")[0]
            return [(f"layers/{idx}/post_ffn_norm/weight", None, arr)]
        return super().map_hf_weight(name, arr)
