"""Grok-1 / Grok-2 (xAI) MoE decoder.

Behavioral reference: srt/models/grok.py. Quirks vs Mixtral:
- sandwich RMSNorms: pre/post around BOTH attention and the FFN block
  (pre_attn_norm/post_attn_norm/pre_moe_norm/post_moe_norm);
- attention logit soft-capping (tanh, default 30) and router logit
  soft-capping (30) before the softmax top-k (no renormalize);
- gelu-tanh expert activation (Grok1MLP GeluAndMul);
- embedding_multiplier_scale on the input embedding and
  output_multiplier_scale on the logits (the reference bakes the latter
  into lm_head at load; we scale in compute_logits — same numerics);
- Grok-2 "residual_moe": a dense MLP runs beside the routed experts and
  the outputs average with 1/sqrt(2);
- optional rope_rotate_half_dims: rotary over head_dim/2 only.

No HF transformers class exists; parity is checked against an
independent torch reimplementation (tests/test_grok.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import Params, SpecTree, join
from sglang_tpu.layers.embedding import LMHead, VocabEmbedding
from sglang_tpu.layers.linear import (
    ColumnParallelLinear,
    FusedColumnLinear,
    RowParallelLinear,
)
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaForCausalLM, LlamaMLP


def _grok_route(logits: jax.Array, k: int, cap: float):
    if cap > 0.0:
        logits = cap * jnp.tanh(logits / cap)
    probs = jax.nn.softmax(logits, axis=-1)
    w, idx = jax.lax.top_k(probs, k)
    return w, idx


class GrokAttention:
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
        rot_dim = (
            self.hd // 2
            if getattr(hf, "rope_rotate_half_dims", False) else self.hd
        )
        self.rotary = RotaryEmbedding(
            self.hd, rot_dim, c.context_length, c.rope_theta, None
        )
        self.scale = self.hd**-0.5
        self.logit_cap = float(
            getattr(hf, "attn_logit_softcapping", 30.0) or 0.0
        )
        self.window = 0

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.q_proj.specs(join(p, "q_proj")))
        s.update(self.kv_proj.specs(join(p, "kv_proj")))
        s.update(self.o_proj.specs(join(p, "o_proj")))
        return s

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend):
        T = x.shape[0]
        q = self.q_proj(params, join(p, "q_proj"), x).reshape(
            T, self.nq, self.hd
        )
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k = kv_new[:, 0, :].reshape(T, self.nk, self.hd)
        v = kv_new[:, 1, :].reshape(T, self.nk, self.hd)
        q, k = self.rotary(fb.positions, q, k)
        out, kv = attn_backend(
            q, k, v, self.layer_id, kv, fb,
            logit_cap=self.logit_cap, scale=self.scale,
        )
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class GrokDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        hf = c.hf_config
        self.attn = GrokAttention(c, layer_id)
        k = int(getattr(hf, "num_experts_per_tok", 2) or 2)
        cap = float(getattr(hf, "router_logit_softcapping", 30.0) or 0.0)
        moe_inter = int(
            getattr(hf, "moe_intermediate_size", None)
            or c.intermediate_size
        )
        self.moe = FusedMoE(
            num_experts=int(getattr(hf, "num_local_experts", 8)),
            top_k=k,
            hidden_size=c.hidden_size,
            intermediate_size=moe_inter,
            dtype=c.dtype,
            renormalize=False,
            route_fn=lambda logits: _grok_route(logits, k, cap),
            activation="gelu",
        )
        # Grok-2: dense MLP beside the routed experts, averaged /sqrt(2).
        self.residual_moe = bool(getattr(hf, "residual_moe", False))
        self.mlp = (
            LlamaMLP(c, layer_id) if self.residual_moe else None
        )
        if self.mlp is not None:
            from sglang_tpu.layers.activation import gelu_tanh_and_mul

            self.mlp.act = gelu_tanh_and_mul
        mk = lambda: RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.pre_attn_norm = mk()
        self.post_attn_norm = mk()
        self.pre_moe_norm = mk()
        self.post_moe_norm = mk()

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.moe.specs(join(p, "moe")))
        if self.mlp is not None:
            s.update(self.mlp.specs(join(p, "mlp")))
        for n in ("pre_attn_norm", "post_attn_norm", "pre_moe_norm",
                  "post_moe_norm"):
            s.update(getattr(self, n).specs(join(p, n)))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        if residual is None:
            residual = x
        h = self.pre_attn_norm(params, join(p, "pre_attn_norm"), residual)
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        a = self.post_attn_norm(params, join(p, "post_attn_norm"), a)
        residual = residual + a
        h = self.pre_moe_norm(params, join(p, "pre_moe_norm"), residual)
        f = self.moe(params, join(p, "moe"), h)
        if self.mlp is not None:
            f = (f + self.mlp(params, join(p, "mlp"), h)) / math.sqrt(2.0)
        f = self.post_moe_norm(params, join(p, "post_moe_norm"), f)
        residual = residual + f
        return f, residual, kv


class Grok1ForCausalLM:
    hf_prefix = "model"
    supports_pp = False  # deferred-norm residual flow

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        hf = c.hf_config
        self.embed_scale = float(
            getattr(hf, "embedding_multiplier_scale", 1.0) or 1.0
        )
        self.output_scale = float(
            getattr(hf, "output_multiplier_scale", 1.0) or 1.0
        )
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.decoder_layers = [
            GrokDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, c.dtype)

    def param_specs(self) -> SpecTree:
        s = {}
        s.update(self.embed.specs("embed"))
        for i, layer in enumerate(self.decoder_layers):
            s.update(layer.specs(f"layers/{i}"))
        s.update(self.final_norm.specs("final_norm"))
        if not self.config.tie_word_embeddings:
            s.update(self.lm_head.specs("lm_head"))
        return s

    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None):
        x = self.embed(params, "embed", fb.input_ids)
        x = x * jnp.asarray(self.embed_scale, x.dtype)
        residual = None
        for i, layer in enumerate(self.decoder_layers):
            x, residual, kv = layer(
                params, f"layers/{i}", x, residual, fb, kv, attn_backend
            )
        x = self.final_norm(params, "final_norm", residual)
        return x, kv

    def compute_logits(self, params: Params, hidden: jax.Array):
        head = "embed" if self.config.tie_word_embeddings else "lm_head"
        logits = self.lm_head(params, head, hidden)
        return logits * jnp.asarray(self.output_scale, logits.dtype)

    def map_hf_weight(self, name: str, arr: np.ndarray):
        pre = self.hf_prefix
        if name == f"{pre}.embed_tokens.weight":
            return [("embed/weight", None, arr)]
        if name == "lm_head.weight":
            if self.config.tie_word_embeddings:
                return []
            return [("lm_head/weight", None, arr)]
        if name == f"{pre}.norm.weight":
            return [("final_norm/weight", None, arr)]
        if not name.startswith(f"{pre}.layers."):
            return []
        rest = name[len(pre) + 8 :]
        idx, sub = rest.split(".", 1)
        p = f"layers/{idx}"
        m = {
            "self_attn.q_proj.weight": (f"{p}/attn/q_proj/weight", None),
            "self_attn.k_proj.weight": (f"{p}/attn/kv_proj/weight", 0),
            "self_attn.v_proj.weight": (f"{p}/attn/kv_proj/weight", 1),
            "self_attn.o_proj.weight": (f"{p}/attn/o_proj/weight", None),
            "mlp.gate_proj.weight": (f"{p}/mlp/gate_up/weight", 0),
            "mlp.up_proj.weight": (f"{p}/mlp/gate_up/weight", 1),
            "mlp.down_proj.weight": (f"{p}/mlp/down/weight", None),
        }
        if sub in m:
            pname, slot = m[sub]
            return [(pname, slot, arr.T)]
        norms = {
            "pre_attn_norm.weight": f"{p}/pre_attn_norm/weight",
            "post_attn_norm.weight": f"{p}/post_attn_norm/weight",
            "pre_moe_norm.weight": f"{p}/pre_moe_norm/weight",
            "post_moe_norm.weight": f"{p}/post_moe_norm/weight",
        }
        if sub in norms:
            return [(norms[sub], None, arr)]
        if sub == "block_sparse_moe.gate.weight":
            return [(f"{p}/moe/router", None, arr.T)]
        if sub.startswith("block_sparse_moe.experts."):
            parts = sub.split(".")
            e, w = int(parts[2]), parts[3]
            if w == "w1":
                return [(f"{p}/moe/w_gate_up", ("expert_gate", e), arr.T)]
            if w == "w3":
                return [(f"{p}/moe/w_gate_up", ("expert_up", e), arr.T)]
            if w == "w2":
                return [(f"{p}/moe/w_down", ("expert_down", e), arr.T)]
        return []
