"""Persimmon (Adept): per-head q/k LayerNorm, partial rope, relu² MLP.

Behavioral reference: srt/models/persimmon.py lineage + HF
PersimmonForCausalLM. Fused qkv ships interleaved per head [nh, 3, hd];
q/k get a full LayerNorm (weight+bias over head_dim) before the
partial (0.5) rotary; every projection carries bias.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, SpecTree, join
from sglang_tpu.layers.linear import ColumnParallelLinear, RowParallelLinear
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


class PersimmonAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        config.attention_bias = True
        super().__init__(config, layer_id)
        c = config
        hf = c.hf_config
        self.o_proj = RowParallelLinear(self.nq * self.hd, c.hidden_size,
                                        c.dtype, bias=True)
        pr = getattr(hf, "partial_rotary_factor", 0.5) or 0.5
        self.rotary = RotaryEmbedding(
            self.hd, int(self.hd * pr), c.max_position_embeddings,
            getattr(hf, "rope_theta", 25000.0),
            getattr(hf, "rope_scaling", None),
        )
        self.use_qk_ln = bool(getattr(hf, "qk_layernorm", True))
        self.eps = float(getattr(hf, "layer_norm_eps", 1e-5))

    def specs(self, p: str) -> SpecTree:
        s = super().specs(p)
        if self.use_qk_ln:
            for n in ("q_ln", "k_ln"):
                s[join(p, f"{n}/weight")] = ParamSpec((self.hd,),
                                                      self.q_proj.dtype)
                s[join(p, f"{n}/bias")] = ParamSpec((self.hd,),
                                                    self.q_proj.dtype)
        return s

    def _head_ln(self, params, p, n, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (xf * params[join(p, f"{n}/weight")]
                + params[join(p, f"{n}/bias")]).astype(x.dtype)

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        T = x.shape[0]
        q = self.q_proj(params, join(p, "q_proj"), x).reshape(
            T, self.nq, self.hd
        )
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k = kv_new[:, 0, :].reshape(T, self.nk, self.hd)
        v = kv_new[:, 1, :].reshape(T, self.nk, self.hd)
        if self.use_qk_ln:
            q = self._head_ln(params, p, "q_ln", q)
            k = self._head_ln(params, p, "k_ln", k)
        q, k = self.rotary(fb.positions, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        return self.o_proj(params, join(p, "o_proj"),
                           out.reshape(T, -1)), kv


class PersimmonMLP:
    def __init__(self, config: ModelConfig):
        c = config
        inner = c.intermediate_size
        self.fc1 = ColumnParallelLinear(c.hidden_size, inner, c.dtype,
                                        bias=True)
        self.fc2 = RowParallelLinear(inner, c.hidden_size, c.dtype,
                                     bias=True)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.fc1.specs(join(p, "fc1")))
        s.update(self.fc2.specs(join(p, "fc2")))
        return s

    def __call__(self, params, p, x, lora=None):
        h = self.fc1(params, join(p, "fc1"), x)
        h = jnp.square(jax.nn.relu(h))  # relu2
        return self.fc2(params, join(p, "fc2"), h)


class PersimmonDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        eps = float(getattr(c.hf_config, "layer_norm_eps", 1e-5))
        self.attn = PersimmonAttention(c, layer_id)
        self.mlp = PersimmonMLP(c)
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
        return x + self.mlp(params, join(p, "mlp"), h), None, kv


class PersimmonForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        eps = float(getattr(c.hf_config, "layer_norm_eps", 1e-5))
        self.decoder_layers = [
            PersimmonDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = LayerNorm(c.hidden_size, eps, c.dtype)

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
        if name == "lm_head.weight":
            if self.config.tie_word_embeddings:
                return []
            return [("lm_head/weight", None, arr)]
        if name.startswith("model.final_layernorm."):
            return [(f"final_norm/{name.split('.')[-1]}", None, arr)]
        if not name.startswith("model.layers."):
            return []
        idx, sub = name[len("model.layers."):].split(".", 1)
        p = f"layers/{idx}"
        nh = self.config.num_attention_heads
        hd = self.config.head_dim
        if sub == "self_attn.query_key_value.weight":
            w = arr.reshape(nh, 3, hd, -1)
            return [
                (f"{p}/attn/q_proj/weight", None,
                 w[:, 0].reshape(nh * hd, -1).T),
                (f"{p}/attn/kv_proj/weight", 0,
                 w[:, 1].reshape(nh * hd, -1).T),
                (f"{p}/attn/kv_proj/weight", 1,
                 w[:, 2].reshape(nh * hd, -1).T),
            ]
        if sub == "self_attn.query_key_value.bias":
            b = arr.reshape(nh, 3, hd)
            return [
                (f"{p}/attn/q_proj/bias", None, b[:, 0].reshape(-1)),
                (f"{p}/attn/kv_proj/bias", 0, b[:, 1].reshape(-1)),
                (f"{p}/attn/kv_proj/bias", 1, b[:, 2].reshape(-1)),
            ]
        m = {
            "self_attn.dense.weight": (f"{p}/attn/o_proj/weight", "t"),
            "self_attn.dense.bias": (f"{p}/attn/o_proj/bias", ""),
            "self_attn.q_layernorm.weight": (f"{p}/attn/q_ln/weight", ""),
            "self_attn.q_layernorm.bias": (f"{p}/attn/q_ln/bias", ""),
            "self_attn.k_layernorm.weight": (f"{p}/attn/k_ln/weight", ""),
            "self_attn.k_layernorm.bias": (f"{p}/attn/k_ln/bias", ""),
            "mlp.dense_h_to_4h.weight": (f"{p}/mlp/fc1/weight", "t"),
            "mlp.dense_h_to_4h.bias": (f"{p}/mlp/fc1/bias", ""),
            "mlp.dense_4h_to_h.weight": (f"{p}/mlp/fc2/weight", "t"),
            "mlp.dense_4h_to_h.bias": (f"{p}/mlp/fc2/bias", ""),
            "input_layernorm.weight": (f"{p}/input_norm/weight", ""),
            "input_layernorm.bias": (f"{p}/input_norm/bias", ""),
            "post_attention_layernorm.weight": (f"{p}/post_norm/weight", ""),
            "post_attention_layernorm.bias": (f"{p}/post_norm/bias", ""),
        }
        if sub in m:
            pn, tf = m[sub]
            return [(pn, None, arr.T if tf else arr)]
        return []
