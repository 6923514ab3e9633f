"""DBRX (Databricks MoE).

Behavioral reference: srt/models/dbrx.py (HF modeling_dbrx as the parity
oracle). Structure: fused Wqkv with clip_qkv clamping, bias-free
LayerNorms (pre-attn / pre-ffn / final), untied wte/lm_head, and a
16-expert MoE in every layer: softmax router -> top-k -> p-norm weight
normalization (moe_normalize_expert_weights; p=1 -> sum). Expert weights
ship fused as w1/v1/w2 [E*I, H] blocks. Token-identical to HF
(tests/test_moe_models2.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.layers.linear import (
    FusedColumnLinear,
    RowParallelLinear,
)
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaForCausalLM


class DbrxAttention:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        self.layer_id = layer_id
        self.nq, self.nk, self.hd = (
            c.num_attention_heads, c.num_key_value_heads, c.head_dim
        )
        attn_cfg = getattr(c.hf_config, "attn_config", None)
        self.clip = getattr(attn_cfg, "clip_qkv", None) if attn_cfg else None
        # one fused Wqkv: q rides slot layout [nq*hd | nk*hd | nk*hd]
        self.q_proj = FusedColumnLinear(c.hidden_size, 1, self.nq * self.hd,
                                        c.dtype)
        self.kv_proj = FusedColumnLinear(c.hidden_size, 2, self.nk * self.hd,
                                         c.dtype)
        self.o_proj = RowParallelLinear(self.nq * self.hd, c.hidden_size,
                                        c.dtype)
        self.rotary = RotaryEmbedding(self.hd, None, c.context_length,
                                      c.rope_theta, c.rope_scaling)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.q_proj.specs(join(p, "q_proj")))
        s.update(self.kv_proj.specs(join(p, "kv_proj")))
        s.update(self.o_proj.specs(join(p, "o_proj")))
        return s

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend):
        T = x.shape[0]
        q_flat = self.q_proj(params, join(p, "q_proj"), x)[:, 0, :]
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k_flat, v_flat = kv_new[:, 0, :], kv_new[:, 1, :]
        if self.clip:
            clip = jnp.asarray(self.clip, q_flat.dtype)
            q_flat = jnp.clip(q_flat, -clip, clip)
            k_flat = jnp.clip(k_flat, -clip, clip)
            v_flat = jnp.clip(v_flat, -clip, clip)
        q = q_flat.reshape(T, self.nq, self.hd)
        k = k_flat.reshape(T, self.nk, self.hd)
        v = v_flat.reshape(T, self.nk, self.hd)
        q, k = self.rotary(fb.positions, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class DbrxFFN:
    """Softmax-topk router with p-norm weight normalization over the
    FusedMoE grouped-GEMM expert compute."""

    def __init__(self, config: ModelConfig):
        c = config
        hf = c.hf_config
        ffn_cfg = getattr(hf, "ffn_config", None)
        self.norm_p = getattr(ffn_cfg, "moe_normalize_expert_weights", 1.0) \
            if ffn_cfg else 1.0
        self.n_experts = c.num_experts
        self.top_k = c.num_experts_per_tok
        self.moe = FusedMoE(
            num_experts=c.num_experts,
            top_k=c.num_experts_per_tok,
            hidden_size=c.hidden_size,
            intermediate_size=c.moe_intermediate_size or c.intermediate_size,
            dtype=c.dtype,
        )

    def specs(self, p: str) -> SpecTree:
        return self.moe.specs(p)

    def __call__(self, params, p, x):
        from sglang_tpu.eplb import maybe_record

        logits = jnp.dot(
            x.astype(jnp.float32), params[join(p, "router")].astype(jnp.float32)
        )
        probs = jax.nn.softmax(logits, axis=-1)
        w, idx = jax.lax.top_k(probs, self.top_k)
        if self.norm_p is not None:
            scale = jnp.sum(jnp.abs(w) ** self.norm_p, axis=-1,
                            keepdims=True) ** (1.0 / self.norm_p)
            w = w / scale
        maybe_record(p, idx, self.n_experts)
        l2p = params[join(p, "eplb_log2phy")]
        sel = l2p[idx][..., 0] if l2p.ndim == 2 else l2p[idx]
        return self.moe.compute_experts(params, p, x, w, sel)


class DbrxBlock:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        self.attn = DbrxAttention(c, layer_id)
        self.ffn = DbrxFFN(c)
        self.norm_1 = LayerNorm(c.hidden_size, 1e-5, c.dtype, bias=False)
        self.norm_2 = LayerNorm(c.hidden_size, 1e-5, c.dtype, bias=False)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.ffn.specs(join(p, "mlp")))
        s.update(self.norm_1.specs(join(p, "input_norm")))
        s.update(self.norm_2.specs(join(p, "post_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = self.norm_1(params, join(p, "input_norm"), x)
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = x + a
        h = self.norm_2(params, join(p, "post_norm"), x)
        x = x + self.ffn(params, join(p, "mlp"), h)
        return x, None, kv


class DbrxForCausalLM(LlamaForCausalLM):
    hf_prefix = "transformer"

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            DbrxBlock(config, i) for i in range(config.num_hidden_layers)
        ]
        # final norm is a LayerNorm, not RMSNorm
        self.final_norm = LayerNorm(config.hidden_size, 1e-5, config.dtype,
                                    bias=False)

    def __call__(self, params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None):
        x = self.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name == "transformer.wte.weight":
            return [("embed/weight", None, arr)]
        if name == "lm_head.weight":
            if self.config.tie_word_embeddings:
                return []
            return [("lm_head/weight", None, arr)]
        if name == "transformer.norm_f.weight":
            return [("final_norm/weight", None, arr)]
        if name.startswith("transformer.blocks."):
            rest = name[len("transformer.blocks."):]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}"
            nq = self.config.num_attention_heads * self.config.head_dim
            nk = self.config.num_key_value_heads * self.config.head_dim
            if sub == "norm_attn_norm.attn.Wqkv.weight":
                return [
                    (f"{p}/attn/q_proj/weight", 0, arr[:nq].T),
                    (f"{p}/attn/kv_proj/weight", 0, arr[nq:nq + nk].T),
                    (f"{p}/attn/kv_proj/weight", 1, arr[nq + nk:].T),
                ]
            if sub == "norm_attn_norm.attn.out_proj.weight":
                return [(f"{p}/attn/o_proj/weight", None, arr.T)]
            if sub == "norm_attn_norm.norm_1.weight":
                return [(f"{p}/input_norm/weight", None, arr)]
            if sub == "norm_attn_norm.norm_2.weight":
                return [(f"{p}/post_norm/weight", None, arr)]
            if sub == "ffn.router.layer.weight":
                return [(f"{p}/mlp/router", None, arr.T)]
            if sub in ("ffn.experts.mlp.w1", "ffn.experts.mlp.v1",
                       "ffn.experts.mlp.w2"):
                E = self.config.num_experts
                I = arr.shape[0] // E
                chunks = arr.reshape(E, I, -1)
                kind = sub.rsplit(".", 1)[1]
                out = []
                for e in range(E):
                    if kind == "w1":
                        out.append((f"{p}/mlp/w_gate_up",
                                    ("expert_gate", e), chunks[e].T))
                    elif kind == "v1":
                        out.append((f"{p}/mlp/w_gate_up",
                                    ("expert_up", e), chunks[e].T))
                    else:  # w2: stored [I, H], used untransposed by HF
                        out.append((f"{p}/mlp/w_down",
                                    ("expert_down", e), chunks[e]))
                return out
            return []
        return []
