"""GPTBigCode (StarCoder 1): MQA, learned positions, tanh-gelu MLP.

Behavioral reference: srt/models/gpt_bigcode.py + HF
GPTBigCodeForCausalLM. multi_query=True means ONE kv head — the paged
pool simply gets nk=1 (MQA is GQA's group = nq). c_attn fuses
[q(H) | k(hd) | v(hd)]; Linear layout (transpose on load), LayerNorm
with bias, wte+wpe, tied head.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, SpecTree, join
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.gpt2 import GPT2Attention
from sglang_tpu.models.llama import LlamaForCausalLM
from sglang_tpu.models.phi import PhiMLP


class GPTBigCodeDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        eps = float(getattr(c.hf_config, "layer_norm_epsilon", 1e-5)
                    or 1e-5)
        self.attn = GPT2Attention(c, layer_id)
        self.mlp = PhiMLP(c, layer_id)
        self.ln_1 = LayerNorm(c.hidden_size, eps, c.dtype)
        self.ln_2 = LayerNorm(c.hidden_size, eps, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.ln_1.specs(join(p, "ln_1")))
        s.update(self.ln_2.specs(join(p, "ln_2")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = self.ln_1(params, join(p, "ln_1"), x)
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = x + a
        h = self.ln_2(params, join(p, "ln_2"), x)
        return x + self.mlp(params, join(p, "mlp"), h), None, kv


class GPTBigCodeForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        c = config
        if bool(getattr(c.hf_config, "multi_query", True)):
            c.num_key_value_heads = 1
        if not c.intermediate_size:
            c.intermediate_size = 4 * c.hidden_size
        c.hidden_act = getattr(c.hf_config, "activation_function",
                               "gelu_pytorch_tanh")
        c.tie_word_embeddings = True
        super().__init__(c)
        eps = float(getattr(c.hf_config, "layer_norm_epsilon", 1e-5)
                    or 1e-5)
        self.decoder_layers = [
            GPTBigCodeDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = LayerNorm(c.hidden_size, eps, c.dtype)
        self.n_positions = int(c.max_position_embeddings)

    def param_specs(self) -> SpecTree:
        s = super().param_specs()
        s["wpe/weight"] = ParamSpec(
            (self.n_positions, self.config.hidden_size), self.config.dtype,
            P(), init_scale=0.02,
        )
        return s

    def __call__(self, params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        x = self.embed(params, "embed", fb.input_ids)
        pos = jnp.clip(fb.positions, 0, self.n_positions - 1)
        x = x + params["wpe/weight"][pos]
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name == "wte.weight":
            return [("embed/weight", None, arr)]
        if name == "wpe.weight":
            return [("wpe/weight", None, arr)]
        if name in ("ln_f.weight", "ln_f.bias"):
            return [(f"final_norm/{name.split('.')[1]}", None, arr)]
        if name == "lm_head.weight":
            return []  # tied
        if not name.startswith("h."):
            return []
        idx, sub = name[2:].split(".", 1)
        p = f"layers/{idx}"
        H = self.config.hidden_size
        kvd = self.config.num_key_value_heads * self.config.head_dim
        if sub == "attn.c_attn.weight":  # Linear [H+2*kvd, H]
            return [
                (f"{p}/attn/q_proj/weight", None, arr[:H].T),
                (f"{p}/attn/kv_proj/weight", 0, arr[H:H + kvd].T),
                (f"{p}/attn/kv_proj/weight", 1, arr[H + kvd:].T),
            ]
        if sub == "attn.c_attn.bias":
            return [
                (f"{p}/attn/q_proj/bias", None, arr[:H]),
                (f"{p}/attn/kv_proj/bias", 0, arr[H:H + kvd]),
                (f"{p}/attn/kv_proj/bias", 1, arr[H + kvd:]),
            ]
        m = {
            "attn.c_proj.weight": (f"{p}/attn/o_proj/weight", "t"),
            "attn.c_proj.bias": (f"{p}/attn/o_proj/bias", ""),
            "mlp.c_fc.weight": (f"{p}/mlp/fc1/weight", "t"),
            "mlp.c_fc.bias": (f"{p}/mlp/fc1/bias", ""),
            "mlp.c_proj.weight": (f"{p}/mlp/fc2/weight", "t"),
            "mlp.c_proj.bias": (f"{p}/mlp/fc2/bias", ""),
            "ln_1.weight": (f"{p}/ln_1/weight", ""),
            "ln_1.bias": (f"{p}/ln_1/bias", ""),
            "ln_2.weight": (f"{p}/ln_2/weight", ""),
            "ln_2.bias": (f"{p}/ln_2/bias", ""),
        }
        if sub in m:
            pn, tf = m[sub]
            return [(pn, None, arr.T if tf else arr)]
        return []
