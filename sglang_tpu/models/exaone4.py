"""EXAONE-4.0 decoder (LG AI Research).

Behavioral reference: srt/models/exaone4.py (HF modeling_exaone4 as the
parity oracle). vs Llama: POST-norm layout (no input norm; RMSNorms on
the attention/MLP outputs before the residual add), per-head q/k RMSNorm,
and a hybrid attention schedule when sliding_window is set: sliding
layers use rope, global layers are NoPE (same scheme as Cohere2 but with
neox-style rope). Token-identical to HF (tests/test_glm_family.py).
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
from sglang_tpu.models.llama import (
    LlamaAttention,
    LlamaForCausalLM,
    LlamaMLP,
)


class Exaone4Attention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        config.qk_norm = True  # exaone4 always qk-norms
        super().__init__(config, layer_id)
        c = config
        if c.sliding_window:
            is_sliding = c.layer_is_sliding(layer_id)
            self.window = int(c.sliding_window) if is_sliding else 0
            self.use_rope = is_sliding  # global layers are NoPE
        else:
            self.window = 0
            self.use_rope = True

    def apply_rotary(self, fb: ForwardBatch, q, k):
        if not self.use_rope:
            return q, k
        return self.rotary(fb.positions, q, k)

    def __call__(self, params, p, x, fb, kv, attn_backend, lora=None):
        T = x.shape[0]
        q = self.q_proj(params, join(p, "q_proj"), x).reshape(
            T, self.nq, self.hd
        )
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k = kv_new[:, 0, :].reshape(T, self.nk, self.hd)
        v = kv_new[:, 1, :].reshape(T, self.nk, self.hd)
        q = self.qk_norm(params, join(p, "q_norm"), q)
        k = self.qk_norm(params, join(p, "k_norm"), k)
        q, k = self.apply_rotary(fb, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb,
                               window=self.window)
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class Exaone4DecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        self.attn = Exaone4Attention(c, layer_id)
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
        h = self.post_attn_norm(params, join(p, "post_attn_norm"), h)
        x = x + h
        h = self.mlp(params, join(p, "mlp"), x)
        h = self.post_ffn_norm(params, join(p, "post_ffn_norm"), h)
        return x + h, None, kv


class Exaone4ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        self.decoder_layers = [
            Exaone4DecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        # Hybrid rope/NoPE layers are heterogeneous -> no stacked-scan PP.
        self.supports_pp = not bool(c.sliding_window)

    def __call__(self, params, fb: ForwardBatch, kv, attn_backend,
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

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if ".post_attention_layernorm.weight" in name:
            idx = name.split(".layers.")[1].split(".", 1)[0]
            return [(f"layers/{idx}/post_attn_norm/weight", None, arr)]
        if ".post_feedforward_layernorm.weight" in name:
            idx = name.split(".layers.")[1].split(".", 1)[0]
            return [(f"layers/{idx}/post_ffn_norm/weight", None, arr)]
        return super().map_hf_weight(name, arr)
