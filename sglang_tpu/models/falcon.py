"""Falcon (TII): all three decoder generations behind one class.

Behavioral reference: srt/models/falcon.py lineage + HF
FalconForCausalLM. Variants, selected by config flags:
- falcon-7b: multi_query (1 kv head), parallel attention+MLP off one
  shared input_layernorm;
- falcon-40b/180b: new_decoder_architecture — GQA with the fused qkv
  laid out per kv group [nkv, group+2, hd], parallel block with two
  layernorms (ln_attn / ln_mlp, num_ln_in_parallel_attn);
- falcon-rw: sequential (parallel_attn=False) and/or ALiBi instead of
  rotary (alibi flag -> alibi_slopes through the attention backend).
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


class FalconAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        hf = config.hf_config
        config.attention_bias = bool(getattr(hf, "bias", False))
        super().__init__(config, layer_id)
        self.o_proj = RowParallelLinear(
            self.nq * self.hd, config.hidden_size, config.dtype,
            bias=config.attention_bias,
        )
        self.use_alibi = bool(getattr(hf, "alibi", False))
        if self.use_alibi:
            # Falcon applies (scores + alibi) * inv_norm_factor — the bias
            # is scaled by 1/sqrt(hd) too (modeling_falcon eager path),
            # unlike Bloom where alibi joins unscaled.
            self.alibi_slopes = jnp.asarray(
                alibi_slopes(self.nq) * self.hd ** -0.5
            )

    def apply_rotary(self, fb: ForwardBatch, q, k):
        if self.use_alibi:
            return q, k
        return self.rotary(fb.positions, q, k)


class FalconMLP:
    def __init__(self, config: ModelConfig):
        c = config
        hf = c.hf_config
        bias = bool(getattr(hf, "bias", False))
        inner = int(getattr(hf, "ffn_hidden_size", None)
                    or 4 * c.hidden_size)
        self.fc1 = ColumnParallelLinear(c.hidden_size, inner, c.dtype,
                                        bias=bias)
        self.fc2 = RowParallelLinear(inner, c.hidden_size, c.dtype,
                                     bias=bias)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.fc1.specs(join(p, "fc1")))
        s.update(self.fc2.specs(join(p, "fc2")))
        return s

    def __call__(self, params, p, x, lora=None):
        h = self.fc1(params, join(p, "fc1"), x)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
            x.dtype
        )
        return self.fc2(params, join(p, "fc2"), h)


class FalconDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        hf = c.hf_config
        eps = float(getattr(hf, "layer_norm_epsilon", 1e-5) or 1e-5)
        self.attn = FalconAttention(c, layer_id)
        self.mlp = FalconMLP(c)
        self.new_arch = bool(getattr(hf, "new_decoder_architecture", False))
        self.parallel = bool(getattr(hf, "parallel_attn", True))
        self.num_ln = int(getattr(hf, "num_ln_in_parallel_attn", None)
                          or (2 if self.new_arch else 1))
        if self.new_arch and self.num_ln == 2:
            self.ln_attn = LayerNorm(c.hidden_size, eps, c.dtype)
            self.ln_mlp = LayerNorm(c.hidden_size, eps, c.dtype)
            self.input_norm = None
            self.post_norm = None
        else:
            self.input_norm = LayerNorm(c.hidden_size, eps, c.dtype)
            self.post_norm = (None if (self.parallel or self.new_arch)
                              else LayerNorm(c.hidden_size, eps, c.dtype))
            self.ln_attn = self.ln_mlp = None

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        if self.ln_attn is not None:
            s.update(self.ln_attn.specs(join(p, "ln_attn")))
            s.update(self.ln_mlp.specs(join(p, "ln_mlp")))
        if self.input_norm is not None:
            s.update(self.input_norm.specs(join(p, "input_norm")))
        if self.post_norm is not None:
            s.update(self.post_norm.specs(join(p, "post_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        if self.ln_attn is not None:
            h_attn = self.ln_attn(params, join(p, "ln_attn"), x)
            h_mlp = self.ln_mlp(params, join(p, "ln_mlp"), x)
        else:
            h_attn = self.input_norm(params, join(p, "input_norm"), x)
            h_mlp = h_attn
        a, kv = self.attn(params, join(p, "attn"), h_attn, fb, kv,
                          attn_backend)
        if self.new_arch or self.parallel:
            return x + a + self.mlp(params, join(p, "mlp"), h_mlp), None, kv
        x = x + a
        h = self.post_norm(params, join(p, "post_norm"), x)
        return x + self.mlp(params, join(p, "mlp"), h), None, kv


class FalconForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        c = config
        hf = c.hf_config
        self.new_arch = bool(getattr(hf, "new_decoder_architecture", False))
        if self.new_arch:
            c.num_key_value_heads = int(getattr(hf, "num_kv_heads", None)
                                        or c.num_attention_heads)
        elif bool(getattr(hf, "multi_query", True)):
            c.num_key_value_heads = 1
        c.tie_word_embeddings = True
        super().__init__(c)
        eps = float(getattr(hf, "layer_norm_epsilon", 1e-5) or 1e-5)
        self.decoder_layers = [
            FalconDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = LayerNorm(c.hidden_size, eps, c.dtype)

    def __call__(self, params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        x = self.embed(params, "embed", fb.input_ids)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def _split_qkv(self, arr: np.ndarray):
        """HF fused query_key_value rows -> (q, k, v) row blocks."""
        nh = self.config.num_attention_heads
        nkv = self.config.num_key_value_heads
        hd = self.config.head_dim
        if self.new_arch:
            w = arr.reshape(nkv, nh // nkv + 2, hd, *arr.shape[1:])
            q = w[:, :-2].reshape(nh * hd, *arr.shape[1:])
            k = w[:, -2].reshape(nkv * hd, *arr.shape[1:])
            v = w[:, -1].reshape(nkv * hd, *arr.shape[1:])
        elif nkv == 1:  # multi_query: [q(H) | k(hd) | v(hd)]
            H = nh * hd
            q, k, v = arr[:H], arr[H:H + hd], arr[H + hd:]
        else:  # old MHA: interleaved per head [nh, 3, hd]
            w = arr.reshape(nh, 3, hd, *arr.shape[1:])
            q = w[:, 0].reshape(nh * hd, *arr.shape[1:])
            k = w[:, 1].reshape(nh * hd, *arr.shape[1:])
            v = w[:, 2].reshape(nh * hd, *arr.shape[1:])
        return q, k, v

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name == "word_embeddings.weight":
            return [("embed/weight", None, arr)]
        if name.startswith("ln_f."):
            return [(f"final_norm/{name.split('.')[1]}", None, arr)]
        if name == "lm_head.weight":
            return []  # tied
        if not name.startswith("h."):
            return []
        idx, sub = name[2:].split(".", 1)
        p = f"layers/{idx}"
        if sub == "self_attention.query_key_value.weight":
            q, k, v = self._split_qkv(arr)
            return [
                (f"{p}/attn/q_proj/weight", None, q.T),
                (f"{p}/attn/kv_proj/weight", 0, k.T),
                (f"{p}/attn/kv_proj/weight", 1, v.T),
            ]
        if sub == "self_attention.query_key_value.bias":
            q, k, v = self._split_qkv(arr)
            return [
                (f"{p}/attn/q_proj/bias", None, q),
                (f"{p}/attn/kv_proj/bias", 0, k),
                (f"{p}/attn/kv_proj/bias", 1, v),
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
            "ln_attn.weight": (f"{p}/ln_attn/weight", ""),
            "ln_attn.bias": (f"{p}/ln_attn/bias", ""),
            "ln_mlp.weight": (f"{p}/ln_mlp/weight", ""),
            "ln_mlp.bias": (f"{p}/ln_mlp/bias", ""),
        }
        if sub in m:
            pn, tf = m[sub]
            return [(pn, None, arr.T if tf else arr)]
        return []
