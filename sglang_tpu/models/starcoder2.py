"""Starcoder2 decoder. Ref: srt/models/starcoder2.py.

vs Llama: full LayerNorm (with bias) instead of RMSNorm, an UNGATED MLP
(c_fc -> gelu_tanh -> c_proj, both biased), biased q/k/v/o projections,
optional sliding window, tied embeddings by default. Tested
token-identical to HF.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import Params, SpecTree, join
from sglang_tpu.layers.linear import ColumnParallelLinear, RowParallelLinear
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


class Starcoder2MLP:
    def __init__(self, config: ModelConfig):
        c = config
        self.c_fc = ColumnParallelLinear(
            c.hidden_size, c.intermediate_size, c.dtype, bias=True
        )
        self.c_proj = RowParallelLinear(
            c.intermediate_size, c.hidden_size, c.dtype, bias=True
        )

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.c_fc.specs(join(p, "c_fc")))
        s.update(self.c_proj.specs(join(p, "c_proj")))
        return s

    def __call__(self, params, p, x):
        h = self.c_fc(params, join(p, "c_fc"), x)
        h = jax.nn.gelu(h, approximate=True)
        return self.c_proj(params, join(p, "c_proj"), h)


class Starcoder2Attention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        config.attention_bias = bool(
            getattr(config.hf_config, "use_bias", True)
        )
        super().__init__(config, layer_id)
        # o_proj is biased in starcoder2.
        self.o_proj = RowParallelLinear(
            self.nq * self.hd, config.hidden_size, config.dtype, bias=True
        )
        self.window = int(config.sliding_window or 0)

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
            q, k, v, self.layer_id, kv, fb, window=self.window
        )
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class Starcoder2DecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        eps = getattr(c.hf_config, "norm_epsilon", None) or c.rms_norm_eps
        self.attn = Starcoder2Attention(c, layer_id)
        self.mlp = Starcoder2MLP(c)
        self.input_norm = LayerNorm(c.hidden_size, eps, c.dtype)
        self.post_norm = LayerNorm(c.hidden_size, eps, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.input_norm.specs(join(p, "input_norm")))
        s.update(self.post_norm.specs(join(p, "post_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = self.input_norm(params, join(p, "input_norm"), x)
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = x + a
        h = self.post_norm(params, join(p, "post_norm"), x)
        x = x + self.mlp(params, join(p, "mlp"), h)
        return x, None, kv


class Starcoder2ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        eps = getattr(c.hf_config, "norm_epsilon", None) or c.rms_norm_eps
        self.decoder_layers = [
            Starcoder2DecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = LayerNorm(c.hidden_size, eps, c.dtype)

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

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name == "model.norm.bias":
            return [("final_norm/bias", None, arr)]
        if name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}"
            m = {
                "self_attn.o_proj.bias": (f"{p}/attn/o_proj/bias", ""),
                "mlp.c_fc.weight": (f"{p}/mlp/c_fc/weight", "t"),
                "mlp.c_fc.bias": (f"{p}/mlp/c_fc/bias", ""),
                "mlp.c_proj.weight": (f"{p}/mlp/c_proj/weight", "t"),
                "mlp.c_proj.bias": (f"{p}/mlp/c_proj/bias", ""),
                "input_layernorm.bias": (f"{p}/input_norm/bias", ""),
                "post_attention_layernorm.bias": (f"{p}/post_norm/bias", ""),
            }
            if sub in m:
                pname, tf = m[sub]
                if "t" in tf:
                    arr = arr.T
                return [(pname, None, arr)]
        return super().map_hf_weight(name, arr)
