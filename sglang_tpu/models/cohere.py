"""Cohere v1 (Command-R / Aya): parallel residual, interleaved rope.

Behavioral reference: srt/models/commandr.py + HF CohereForCausalLM.
vs Cohere2: rope on EVERY layer (no sliding/NoPE split) and optional
per-head q/k LayerNorm (use_qk_norm, Command-R+). Same bias-free
LayerNorm, x + attn(norm(x)) + mlp(norm(x)) block, tied embeddings
with logit_scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, SpecTree, join
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.cohere2 import Cohere2ForCausalLM
from sglang_tpu.models.deepseek_v2 import (
    _apply_interleaved_rope,
    _interleaved_rope_tables,
)
from sglang_tpu.models.llama import LlamaAttention, LlamaMLP
from sglang_tpu.layers.norms import LayerNorm


class CohereAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        self.cos, self.sin = _interleaved_rope_tables(
            self.hd, c.context_length, c.rope_theta, c.rope_scaling
        )
        self.use_qk_norm = bool(getattr(c.hf_config, "use_qk_norm", False))
        self.eps = getattr(c.hf_config, "layer_norm_eps", None) \
            or c.rms_norm_eps

    def specs(self, p: str) -> SpecTree:
        s = super().specs(p)
        if self.use_qk_norm:
            # per-head mean-centered LayerNorm, no bias (HF CohereLayerNorm)
            s[join(p, "q_ln/weight")] = ParamSpec((self.nq, self.hd),
                                                  self.q_proj.dtype)
            s[join(p, "k_ln/weight")] = ParamSpec((self.nk, self.hd),
                                                  self.q_proj.dtype)
        return s

    def _head_ln(self, params, key, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (xf * params[key][None]).astype(x.dtype)

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        T = x.shape[0]
        q = self.q_proj(params, join(p, "q_proj"), x).reshape(
            T, self.nq, self.hd
        )
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k = kv_new[:, 0, :].reshape(T, self.nk, self.hd)
        v = kv_new[:, 1, :].reshape(T, self.nk, self.hd)
        if self.use_qk_norm:
            q = self._head_ln(params, join(p, "q_ln/weight"), q)
            k = self._head_ln(params, join(p, "k_ln/weight"), k)
        cos = self.cos[fb.positions]
        sin = self.sin[fb.positions]
        q = _apply_interleaved_rope(q, cos, sin)
        k = _apply_interleaved_rope(k, cos, sin)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        return self.o_proj(params, join(p, "o_proj"),
                           out.reshape(T, -1)), kv


class CohereDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        eps = getattr(c.hf_config, "layer_norm_eps", None) or c.rms_norm_eps
        self.attn = CohereAttention(c, layer_id)
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


class CohereForCausalLM(Cohere2ForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            CohereDecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name == "model.embed_tokens.weight":
            return [("embed/weight", None, arr)]
        if name == "model.norm.weight":
            return [("final_norm/weight", None, arr)]
        if name == "lm_head.weight":
            return []  # tied
        if not name.startswith("model.layers."):
            return []
        idx, sub = name[len("model.layers."):].split(".", 1)
        p = f"layers/{idx}"
        if sub == "input_layernorm.weight":
            return [(join(p, "input_norm/weight"), None, arr)]
        m = {
            "self_attn.q_proj.weight": (f"{p}/attn/q_proj/weight", None, "t"),
            "self_attn.k_proj.weight": (f"{p}/attn/kv_proj/weight", 0, "t"),
            "self_attn.v_proj.weight": (f"{p}/attn/kv_proj/weight", 1, "t"),
            "self_attn.o_proj.weight": (f"{p}/attn/o_proj/weight", None, "t"),
            "self_attn.q_norm.weight": (f"{p}/attn/q_ln/weight", None, "h"),
            "self_attn.k_norm.weight": (f"{p}/attn/k_ln/weight", None, "h"),
            "mlp.gate_proj.weight": (f"{p}/mlp/gate_up/weight", 0, "t"),
            "mlp.up_proj.weight": (f"{p}/mlp/gate_up/weight", 1, "t"),
            "mlp.down_proj.weight": (f"{p}/mlp/down/weight", None, "t"),
        }
        if sub in m:
            pn, slot, tf = m[sub]
            if tf == "t":
                arr = arr.T
            elif tf == "h":
                arr = arr.reshape(-1, self.config.head_dim)
            return [(pn, slot, arr)]
        return []
