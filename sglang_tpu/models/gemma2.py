"""Gemma2 decoder. Behavioral reference: srt/models/gemma2.py.

Quirks vs Llama (all matched to HF Gemma2ForCausalLM for token-identical
greedy): embedding scaled by sqrt(hidden); gemma-style RMSNorm (1+w) in a
pre/post sandwich around BOTH attention and MLP; per-layer alternating
sliding-window attention (even layers); attn logit soft-capping; final
logit soft-capping; query_pre_attn_scalar attention scale; gelu_tanh MLP.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import gelu_tanh_and_mul
from sglang_tpu.layers.base import Params, SpecTree, join
from sglang_tpu.layers.embedding import LMHead, VocabEmbedding
from sglang_tpu.layers.linear import (
    ColumnParallelLinear,
    FusedColumnLinear,
    RowParallelLinear,
)
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaForCausalLM


class Gemma2Attention:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        hf = c.hf_config
        self.layer_id = layer_id
        self.nq, self.nk, self.hd = (
            c.num_attention_heads, c.num_key_value_heads, c.head_dim
        )
        dt = c.dtype
        self.q_proj = ColumnParallelLinear(c.hidden_size, self.nq * self.hd, dt)
        self.kv_proj = FusedColumnLinear(c.hidden_size, 2, self.nk * self.hd, dt)
        self.o_proj = RowParallelLinear(self.nq * self.hd, c.hidden_size, dt)
        self.rotary = RotaryEmbedding(
            self.hd, None, c.context_length, c.rope_theta, None
        )
        qpas = getattr(hf, "query_pre_attn_scalar", self.hd)
        self.scale = qpas**-0.5
        self.logit_cap = float(getattr(hf, "attn_logit_softcapping", 0.0) or 0.0)
        # HF Gemma2: sliding window on layers where not bool(layer_idx % 2)
        self.window = (
            int(c.sliding_window or 0) if layer_id % 2 == 0 else 0
        )

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.q_proj.specs(join(p, "q_proj")))
        s.update(self.kv_proj.specs(join(p, "kv_proj")))
        s.update(self.o_proj.specs(join(p, "o_proj")))
        return s

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        T = x.shape[0]
        q = self.q_proj(params, join(p, "q_proj"), x).reshape(T, self.nq, self.hd)
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k = kv_new[:, 0, :].reshape(T, self.nk, self.hd)
        v = kv_new[:, 1, :].reshape(T, self.nk, self.hd)
        q, k = self.rotary(fb.positions, q, k)
        out, kv = attn_backend(
            q, k, v, self.layer_id, kv, fb,
            window=self.window, logit_cap=self.logit_cap, scale=self.scale,
        )
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class Gemma2DecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        self.attn = Gemma2Attention(c, layer_id)
        self.gate_up = FusedColumnLinear(c.hidden_size, 2, c.intermediate_size,
                                         c.dtype)
        self.down = RowParallelLinear(c.intermediate_size, c.hidden_size, c.dtype)
        mk = lambda: RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype,
                             gemma_style=True)
        self.input_norm = mk()
        self.post_attn_norm = mk()
        self.pre_ffn_norm = mk()
        self.post_ffn_norm = mk()

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.gate_up.specs(join(p, "mlp/gate_up")))
        s.update(self.down.specs(join(p, "mlp/down")))
        s.update(self.input_norm.specs(join(p, "input_norm")))
        s.update(self.post_attn_norm.specs(join(p, "post_attn_norm")))
        s.update(self.pre_ffn_norm.specs(join(p, "pre_ffn_norm")))
        s.update(self.post_ffn_norm.specs(join(p, "post_ffn_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        # sandwich attention
        if residual is None:
            residual = x
        h = self.input_norm(params, join(p, "input_norm"), x)
        h, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        h = self.post_attn_norm(params, join(p, "post_attn_norm"), h)
        x = residual + h
        # sandwich MLP
        residual = x
        h = self.pre_ffn_norm(params, join(p, "pre_ffn_norm"), x)
        h = gelu_tanh_and_mul(self.gate_up(params, join(p, "mlp/gate_up"), h))
        h = self.down(params, join(p, "mlp/down"), h)
        h = self.post_ffn_norm(params, join(p, "post_ffn_norm"), h)
        x = residual + h
        return x, None, kv


class Gemma2ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.decoder_layers = [
            Gemma2DecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype,
                                  gemma_style=True)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, c.dtype)
        self.embed_scale = math.sqrt(c.hidden_size)
        self.final_cap = float(
            getattr(c.hf_config, "final_logit_softcapping", 0.0) or 0.0
        )

    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        x = self.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        # HF casts the normalizer to the embedding dtype before multiplying
        x = x * jnp.asarray(self.embed_scale, x.dtype)
        residual = None
        for i, layer in enumerate(self.decoder_layers):
            x, residual, kv = layer(
                params, f"layers/{i}", x, residual, fb, kv, attn_backend
            )
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def compute_logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        logits = super().compute_logits(params, hidden)
        if self.final_cap > 0:
            logits = jnp.tanh(logits / self.final_cap) * self.final_cap
        return logits

    def map_hf_weight(self, name: str, arr: np.ndarray):
        pre = "model"
        if name == f"{pre}.embed_tokens.weight":
            return [("embed/weight", None, arr)]
        if name == f"{pre}.norm.weight":
            return [("final_norm/weight", None, arr)]
        if name.startswith(f"{pre}.layers."):
            rest = name[len(pre) + 8 :]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}"
            m = {
                "self_attn.q_proj.weight": (f"{p}/attn/q_proj/weight", None, "t"),
                "self_attn.k_proj.weight": (f"{p}/attn/kv_proj/weight", 0, "t"),
                "self_attn.v_proj.weight": (f"{p}/attn/kv_proj/weight", 1, "t"),
                "self_attn.o_proj.weight": (f"{p}/attn/o_proj/weight", None, "t"),
                "mlp.gate_proj.weight": (f"{p}/mlp/gate_up/weight", 0, "t"),
                "mlp.up_proj.weight": (f"{p}/mlp/gate_up/weight", 1, "t"),
                "mlp.down_proj.weight": (f"{p}/mlp/down/weight", None, "t"),
                "input_layernorm.weight": (f"{p}/input_norm/weight", None, ""),
                "post_attention_layernorm.weight": (
                    f"{p}/post_attn_norm/weight", None, ""),
                "pre_feedforward_layernorm.weight": (
                    f"{p}/pre_ffn_norm/weight", None, ""),
                "post_feedforward_layernorm.weight": (
                    f"{p}/post_ffn_norm/weight", None, ""),
            }
            if sub in m:
                pname, slot, tf = m[sub]
                if "t" in tf:
                    arr = arr.T
                return [(pname, slot, arr)]
        return []
