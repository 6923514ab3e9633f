"""GPT-NeoX decoder (Pythia/NeoX-20B). Behavioral reference: HF
modeling_gpt_neox (srt/models/gpt_neox lineage). vs Llama: LayerNorm with
bias, PARALLEL residual (x + attn(ln1(x)) + mlp(ln2(x))) by default,
head-interleaved fused query_key_value checkpoint tensor, partial neox
rope (rotary_pct), exact-gelu MLP, untied embed_out head.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.linear import ColumnParallelLinear, RowParallelLinear
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM
from sglang_tpu.models.phi import PhiMLP


class GPTNeoXAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        config.attention_bias = bool(
            getattr(config.hf_config, "attention_bias", True)
        )
        super().__init__(config, layer_id)
        c = config
        pct = float(getattr(c.hf_config, "rotary_pct", 0.25) or 0.25)
        self.rotary = RotaryEmbedding(
            self.hd, int(self.hd * pct), c.context_length, c.rope_theta,
            c.rope_scaling,
        )
        self.o_proj = RowParallelLinear(
            self.nq * self.hd, c.hidden_size, c.dtype,
            bias=config.attention_bias,
        )


class GPTNeoXLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        eps = float(getattr(c.hf_config, "layer_norm_eps", 1e-5) or 1e-5)
        self.attn = GPTNeoXAttention(c, layer_id)
        self.mlp = PhiMLP(c, layer_id)
        self.ln_1 = LayerNorm(c.hidden_size, eps, c.dtype)
        self.ln_2 = LayerNorm(c.hidden_size, eps, c.dtype)
        self.parallel = bool(
            getattr(c.hf_config, "use_parallel_residual", True)
        )

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.ln_1.specs(join(p, "ln_1")))
        s.update(self.ln_2.specs(join(p, "ln_2")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        a, kv = self.attn(params, join(p, "attn"),
                          self.ln_1(params, join(p, "ln_1"), x),
                          fb, kv, attn_backend)
        if self.parallel:
            m = self.mlp(params, join(p, "mlp"),
                         self.ln_2(params, join(p, "ln_2"), x))
            return x + a + m, None, kv
        x = x + a
        m = self.mlp(params, join(p, "mlp"),
                     self.ln_2(params, join(p, "ln_2"), x))
        return x + m, None, kv


class GPTNeoXForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        c = config
        c.hidden_act = getattr(c.hf_config, "hidden_act", "gelu")
        super().__init__(c)
        eps = float(getattr(c.hf_config, "layer_norm_eps", 1e-5) or 1e-5)
        self.decoder_layers = [
            GPTNeoXLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = LayerNorm(c.hidden_size, eps, c.dtype)

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
        if name == "gpt_neox.embed_in.weight":
            return [("embed/weight", None, arr)]
        if name == "embed_out.weight":
            return [("lm_head/weight", None, arr)]
        if name.startswith("gpt_neox.final_layer_norm."):
            return [(f"final_norm/{name.rsplit('.', 1)[1]}", None, arr)]
        if name.startswith("gpt_neox.layers."):
            idx, sub = name[len("gpt_neox.layers."):].split(".", 1)
            p = f"layers/{idx}"
            hd = self.config.head_dim
            nh = self.config.num_attention_heads
            if sub == "attention.query_key_value.weight":
                # [3h, in] with rows interleaved per head: [nh, 3, hd, in]
                w = arr.reshape(nh, 3, hd, -1)
                q = w[:, 0].reshape(nh * hd, -1).T
                k = w[:, 1].reshape(nh * hd, -1).T
                v = w[:, 2].reshape(nh * hd, -1).T
                return [
                    (f"{p}/attn/q_proj/weight", None, q),
                    (f"{p}/attn/kv_proj/weight", 0, k),
                    (f"{p}/attn/kv_proj/weight", 1, v),
                ]
            if sub == "attention.query_key_value.bias":
                b = arr.reshape(nh, 3, hd)
                return [
                    (f"{p}/attn/q_proj/bias", None, b[:, 0].reshape(-1)),
                    (f"{p}/attn/kv_proj/bias", 0, b[:, 1].reshape(-1)),
                    (f"{p}/attn/kv_proj/bias", 1, b[:, 2].reshape(-1)),
                ]
            m = {
                "attention.dense.weight": (f"{p}/attn/o_proj/weight", "t"),
                "attention.dense.bias": (f"{p}/attn/o_proj/bias", ""),
                "mlp.dense_h_to_4h.weight": (f"{p}/mlp/fc1/weight", "t"),
                "mlp.dense_h_to_4h.bias": (f"{p}/mlp/fc1/bias", ""),
                "mlp.dense_4h_to_h.weight": (f"{p}/mlp/fc2/weight", "t"),
                "mlp.dense_4h_to_h.bias": (f"{p}/mlp/fc2/bias", ""),
                "input_layernorm.weight": (f"{p}/ln_1/weight", ""),
                "input_layernorm.bias": (f"{p}/ln_1/bias", ""),
                "post_attention_layernorm.weight": (f"{p}/ln_2/weight", ""),
                "post_attention_layernorm.bias": (f"{p}/ln_2/bias", ""),
            }
            if sub in m:
                pname, tf = m[sub]
                if "t" in tf:
                    arr = arr.T
                return [(pname, None, arr)]
        return []
