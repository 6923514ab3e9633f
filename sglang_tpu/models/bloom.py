"""BLOOM: ALiBi MHA decoder (pre-rope BigScience family).

Behavioral reference: srt/models/bloom.py + HF BloomForCausalLM. No
position embeddings at all — ALiBi slopes bias attention logits by key
distance (alibi_slopes through the attention backend). Input embeddings
pass through word_embeddings_layernorm; qkv ships fused per-head
[nh, 3, hd]; MLP is dense 4H with tanh-approximated gelu; tied head.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.alibi import alibi_slopes
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.linear import ColumnParallelLinear, RowParallelLinear
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


class BloomAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        config.attention_bias = True
        super().__init__(config, layer_id)
        self.o_proj = RowParallelLinear(self.nq * self.hd,
                                        config.hidden_size, config.dtype,
                                        bias=True)
        self.alibi_slopes = jnp.asarray(alibi_slopes(self.nq))

    def apply_rotary(self, fb: ForwardBatch, q, k):
        return q, k  # ALiBi only, no rope


class BloomMLP:
    def __init__(self, config: ModelConfig):
        c = config
        inner = 4 * c.hidden_size
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
        # bloom_gelu_forward: tanh approximation
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(
            x.dtype
        )
        return self.fc2(params, join(p, "fc2"), h)


class BloomDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        eps = float(getattr(c.hf_config, "layer_norm_epsilon", 1e-5)
                    or 1e-5)
        self.attn = BloomAttention(c, layer_id)
        self.mlp = BloomMLP(c)
        self.input_norm = LayerNorm(c.hidden_size, eps, c.dtype)
        self.post_norm = LayerNorm(c.hidden_size, eps, c.dtype)
        self.resid_post_ln = bool(
            getattr(c.hf_config,
                    "apply_residual_connection_post_layernorm", False)
        )

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
        res = h if self.resid_post_ln else x
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = res + a
        h = self.post_norm(params, join(p, "post_norm"), x)
        res = h if self.resid_post_ln else x
        return res + self.mlp(params, join(p, "mlp"), h), None, kv


class BloomForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        c = config
        c.tie_word_embeddings = True
        super().__init__(c)
        eps = float(getattr(c.hf_config, "layer_norm_epsilon", 1e-5)
                    or 1e-5)
        self.decoder_layers = [
            BloomDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.embed_norm = LayerNorm(c.hidden_size, eps, c.dtype)
        self.final_norm = LayerNorm(c.hidden_size, eps, c.dtype)

    def param_specs(self) -> SpecTree:
        s = super().param_specs()
        s.update(self.embed_norm.specs("embed_norm"))
        return s

    def __call__(self, params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        x = self.embed(params, "embed", fb.input_ids)
        x = self.embed_norm(params, "embed_norm", x)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name == "word_embeddings.weight":
            return [("embed/weight", None, arr)]
        if name.startswith("word_embeddings_layernorm."):
            return [(f"embed_norm/{name.split('.')[1]}", None, arr)]
        if name.startswith("ln_f."):
            return [(f"final_norm/{name.split('.')[1]}", None, arr)]
        if name == "lm_head.weight":
            return []  # tied
        if not name.startswith("h."):
            return []
        idx, sub = name[2:].split(".", 1)
        p = f"layers/{idx}"
        nh = self.config.num_attention_heads
        hd = self.config.head_dim
        if sub == "self_attention.query_key_value.weight":
            # [nh*3*hd, H] interleaved per head [nh, 3, hd]
            w = arr.reshape(nh, 3, hd, -1)
            q = w[:, 0].reshape(nh * hd, -1).T
            k = w[:, 1].reshape(nh * hd, -1).T
            v = w[:, 2].reshape(nh * hd, -1).T
            return [
                (f"{p}/attn/q_proj/weight", None, q),
                (f"{p}/attn/kv_proj/weight", 0, k),
                (f"{p}/attn/kv_proj/weight", 1, v),
            ]
        if sub == "self_attention.query_key_value.bias":
            b = arr.reshape(nh, 3, hd)
            return [
                (f"{p}/attn/q_proj/bias", None, b[:, 0].reshape(-1)),
                (f"{p}/attn/kv_proj/bias", 0, b[:, 1].reshape(-1)),
                (f"{p}/attn/kv_proj/bias", 1, b[:, 2].reshape(-1)),
            ]
        m = {
            "self_attention.dense.weight": (f"{p}/attn/o_proj/weight", "t"),
            "self_attention.dense.bias": (f"{p}/attn/o_proj/bias", ""),
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
