"""Apertus (Swiss AI): xIELU activation, per-head q/k RMSNorm.

Behavioral reference: HF ApertusForCausalLM. Llama skeleton with an
UNGATED up/down MLP whose activation is xIELU — a learnable piecewise
quadratic/exponential with per-layer alpha_p / alpha_n parameters
(stored softplus-inverse in the checkpoint):

    x > 0:  softplus(a_p) * x² + β x
    x ≤ 0:  (expm1(min(x, ε)) - x) * (β + softplus(a_n)) + β x

Norm names attention_layernorm / feedforward_layernorm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, SpecTree, join
from sglang_tpu.layers.linear import ColumnParallelLinear, RowParallelLinear
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


class ApertusMLP:
    """up -> xIELU -> down (no gate)."""

    def __init__(self, config: ModelConfig):
        c = config
        self.beta = 0.5
        self.xi_eps = -1e-6
        self.fc1 = ColumnParallelLinear(c.hidden_size, c.intermediate_size,
                                        c.dtype, bias=False)
        self.fc2 = RowParallelLinear(c.intermediate_size, c.hidden_size,
                                     c.dtype, bias=False)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.fc1.specs(join(p, "fc1")))
        s.update(self.fc2.specs(join(p, "fc2")))
        s[join(p, "alpha_p")] = ParamSpec((1,), jnp.float32)
        s[join(p, "alpha_n")] = ParamSpec((1,), jnp.float32)
        return s

    def __call__(self, params, p, x, lora=None):
        h = self.fc1(params, join(p, "fc1"), x).astype(jnp.float32)
        a_p = jax.nn.softplus(params[join(p, "alpha_p")])
        a_n = self.beta + jax.nn.softplus(params[join(p, "alpha_n")])
        pos = a_p * jnp.square(h) + self.beta * h
        neg = (jnp.expm1(jnp.minimum(h, self.xi_eps)) - h) * a_n \
            + self.beta * h
        h = jnp.where(h > 0, pos, neg).astype(x.dtype)
        return self.fc2(params, join(p, "fc2"), h)


class ApertusDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        config.qk_norm = True  # per-head RMSNorm before rope
        self.attn = LlamaAttention(c, layer_id)
        self.mlp = ApertusMLP(c)
        self.attn_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.ffn_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.attn_norm.specs(join(p, "attn_norm")))
        s.update(self.ffn_norm.specs(join(p, "ffn_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = self.attn_norm(params, join(p, "attn_norm"), x)
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = x + a
        h = self.ffn_norm(params, join(p, "ffn_norm"), x)
        return x + self.mlp(params, join(p, "mlp"), h), None, kv


class ApertusForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        config.qk_norm = True
        super().__init__(config)
        self.decoder_layers = [
            ApertusDecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]

    def __call__(self, params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None):
        x = self.embed(params, "embed", fb.input_ids)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name == "model.embed_tokens.weight":
            return [("embed/weight", None, arr)]
        if name == "model.norm.weight":
            return [("final_norm/weight", None, arr)]
        if name == "lm_head.weight":
            if self.config.tie_word_embeddings:
                return []
            return [("lm_head/weight", None, arr)]
        if not name.startswith("model.layers."):
            return []
        idx, sub = name[len("model.layers."):].split(".", 1)
        p = f"layers/{idx}"
        m = {
            "self_attn.q_proj.weight": (f"{p}/attn/q_proj/weight", None, 1),
            "self_attn.k_proj.weight": (f"{p}/attn/kv_proj/weight", 0, 1),
            "self_attn.v_proj.weight": (f"{p}/attn/kv_proj/weight", 1, 1),
            "self_attn.o_proj.weight": (f"{p}/attn/o_proj/weight", None, 1),
            "self_attn.q_norm.weight": (f"{p}/attn/q_norm/weight", None, 0),
            "self_attn.k_norm.weight": (f"{p}/attn/k_norm/weight", None, 0),
            "mlp.up_proj.weight": (f"{p}/mlp/fc1/weight", None, 1),
            "mlp.down_proj.weight": (f"{p}/mlp/fc2/weight", None, 1),
            "mlp.act_fn.alpha_p": (f"{p}/mlp/alpha_p", None, 0),
            "mlp.act_fn.alpha_n": (f"{p}/mlp/alpha_n", None, 0),
            "attention_layernorm.weight": (f"{p}/attn_norm/weight", None, 0),
            "feedforward_layernorm.weight": (f"{p}/ffn_norm/weight", None,
                                             0),
        }
        if sub in m:
            pn, slot, tf = m[sub]
            return [(pn, slot, arr.T if tf else arr)]
        return []
