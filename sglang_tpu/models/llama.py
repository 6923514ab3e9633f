"""Llama-family decoder (Llama 2/3/3.x, Mistral, Qwen2, Qwen3 dense).

Behavioral reference: srt/models/llama.py, qwen2.py, qwen3.py. This is a
fresh functional implementation: a pure forward over a flat param dict, with
TP expressed as parameter PartitionSpecs (GSPMD inserts ICI collectives).
Greedy decode is token-identical to HF transformers (verified in
tests/test_model_parity.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import ACT2FN
from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.layers.embedding import LMHead, VocabEmbedding
from sglang_tpu.layers.linear import (
    ColumnParallelLinear,
    FusedColumnLinear,
    RowParallelLinear,
)
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.lora.manager import apply_lora
from sglang_tpu.model_exec.forward_batch import ForwardBatch


class LlamaAttention:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        self.layer_id = layer_id
        self.nq, self.nk, self.hd = (
            c.num_attention_heads,
            c.num_key_value_heads,
            c.head_dim,
        )
        dt = c.dtype
        bias = c.attention_bias
        self.q_proj = ColumnParallelLinear(c.hidden_size, self.nq * self.hd, dt, bias)
        self.kv_proj = FusedColumnLinear(c.hidden_size, 2, self.nk * self.hd, dt, bias)
        self.o_proj = RowParallelLinear(self.nq * self.hd, c.hidden_size, dt, False)
        self.rotary = RotaryEmbedding(
            self.hd,
            None,
            c.context_length,
            c.rope_theta,
            c.rope_scaling,
        )
        self.qk_norm = (
            RMSNorm(self.hd, c.rms_norm_eps, dt) if config.qk_norm else None
        )
        self.window = 0  # subclasses set a per-layer sliding window
        self.alibi_slopes = None  # subclasses set [nq] slopes (Bloom/MPT)

    def apply_rotary(self, fb: ForwardBatch, q, k):
        """Hook for rope variants (Qwen2-VL mrope overrides)."""
        return self.rotary(fb.positions, q, k)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.q_proj.specs(join(p, "q_proj")))
        s.update(self.kv_proj.specs(join(p, "kv_proj")))
        s.update(self.o_proj.specs(join(p, "o_proj")))
        if self.qk_norm:
            s.update(self.qk_norm.specs(join(p, "q_norm")))
            s.update(self.qk_norm.specs(join(p, "k_norm")))
        return s

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        T = x.shape[0]
        q_flat = self.q_proj(params, join(p, "q_proj"), x)
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k_flat = kv_new[:, 0, :]
        v_flat = kv_new[:, 1, :]
        if lora is not None:
            q_flat = q_flat + apply_lora(lora, "q_proj", self.layer_id, x)
            k_flat = k_flat + apply_lora(lora, "kv_proj_k", self.layer_id, x)
            v_flat = v_flat + apply_lora(lora, "kv_proj_v", self.layer_id, x)
        q = q_flat.reshape(T, self.nq, self.hd)
        k = k_flat.reshape(T, self.nk, self.hd)
        v = v_flat.reshape(T, self.nk, self.hd)
        if self.qk_norm:
            q = self.qk_norm(params, join(p, "q_norm"), q)
            k = self.qk_norm(params, join(p, "k_norm"), k)
        q, k = self.apply_rotary(fb, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb,
                               window=self.window,
                               alibi_slopes=self.alibi_slopes)
        out_flat = out.reshape(T, -1)
        out = self.o_proj(params, join(p, "o_proj"), out_flat)
        if lora is not None:
            out = out + apply_lora(lora, "o_proj", self.layer_id, out_flat)
        return out, kv


class LlamaMLP:
    def __init__(self, config: ModelConfig, layer_id: int = 0):
        c = config
        self.layer_id = layer_id
        self.gate_up = FusedColumnLinear(c.hidden_size, 2, c.intermediate_size, c.dtype)
        self.down = RowParallelLinear(c.intermediate_size, c.hidden_size, c.dtype)
        # Lazy: subclasses with non-gated acts (relu2/gelu_new) replace
        # this MLP after the base constructor runs.
        self.act = ACT2FN.get(c.hidden_act)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.gate_up.specs(join(p, "gate_up")))
        s.update(self.down.specs(join(p, "down")))
        return s

    def __call__(self, params, p, x, lora=None):
        gu = self.gate_up(params, join(p, "gate_up"), x)
        if lora is not None:
            g = gu[:, 0, :] + apply_lora(lora, "gate_up_gate", self.layer_id, x)
            u = gu[:, 1, :] + apply_lora(lora, "gate_up_up", self.layer_id, x)
            h = jax.nn.silu(g) * u
        else:
            h = self.act(gu)
        out = self.down(params, join(p, "down"), h)
        if lora is not None:
            out = out + apply_lora(lora, "down", self.layer_id, h)
        return out


class LlamaDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        self.attn = LlamaAttention(c, layer_id)
        self.mlp = LlamaMLP(c, layer_id)
        self.input_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.post_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.input_norm.specs(join(p, "input_norm")))
        s.update(self.post_norm.specs(join(p, "post_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        if residual is None:
            residual = x
            x = self.input_norm(params, join(p, "input_norm"), x)
        else:
            x, residual = self.input_norm(params, join(p, "input_norm"), x, residual)
        x, kv = self.attn(params, join(p, "attn"), x, fb, kv, attn_backend,
                          lora=lora)
        x, residual = self.post_norm(params, join(p, "post_norm"), x, residual)
        if isinstance(self.mlp, LlamaMLP):
            x = self.mlp(params, join(p, "mlp"), x, lora=lora)
        else:
            x = self.mlp(params, join(p, "mlp"), x)
        return x, residual, kv


class LlamaForCausalLM:
    # Subclasses override for HF-name quirks.
    hf_prefix = "model"
    # Homogeneous decoder layers -> eligible for GSPMD GPipe
    # (parallel/pipeline.py PipelinedModel).
    supports_pp = True

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.decoder_layers = [
            LlamaDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, c.dtype)

    # ---- specs ----
    def param_specs(self) -> SpecTree:
        s = {}
        s.update(self.embed.specs("embed"))
        for i, layer in enumerate(self.decoder_layers):
            s.update(layer.specs(f"layers/{i}"))
        s.update(self.final_norm.specs("final_norm"))
        if not self.config.tie_word_embeddings:
            s.update(self.lm_head.specs("lm_head"))
        return s

    # ---- forward ----
    def __call__(
        self, params: Params, fb: ForwardBatch, kv: jax.Array, attn_backend,
        lora=None, input_embeds=None, embed_mask=None,
    ) -> Tuple[jax.Array, jax.Array]:
        x = self.embed(params, "embed", fb.input_ids)
        if lora is not None and "embed_tokens" in lora.pools:
            from sglang_tpu.lora.manager import apply_lora_embedding

            x = x + apply_lora_embedding(lora, fb.input_ids)
        if input_embeds is not None:
            # Multimodal embedding injection (ref srt/managers/mm_utils:
            # image features spliced at placeholder positions).
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        residual = None
        for i, layer in enumerate(self.decoder_layers):
            x, residual, kv = layer(
                params, f"layers/{i}", x, residual, fb, kv, attn_backend,
                lora=lora,
            )
        x, _ = self.final_norm(params, "final_norm", x, residual)
        return x, kv

    def compute_logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        head = "embed" if self.config.tie_word_embeddings else "lm_head"
        return self.lm_head(params, head, hidden)

    # ---- HF weight mapping ----
    def map_hf_weight(self, name: str, arr: np.ndarray):
        """Yield (param_name, sub_index, array) for one HF tensor.

        sub_index selects a fusion slot (e.g. kv_proj k=0/v=1) or None.
        """
        pre = self.hf_prefix
        if name == f"{pre}.embed_tokens.weight":
            return [("embed/weight", None, arr)]
        if name == "lm_head.weight":
            if self.config.tie_word_embeddings:
                return []
            return [("lm_head/weight", None, arr)]
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
                "self_attn.q_proj.bias": (f"{p}/attn/q_proj/bias", None, ""),
                "self_attn.k_proj.bias": (f"{p}/attn/kv_proj/bias", 0, ""),
                "self_attn.v_proj.bias": (f"{p}/attn/kv_proj/bias", 1, ""),
                "self_attn.q_norm.weight": (f"{p}/attn/q_norm/weight", None, ""),
                "self_attn.k_norm.weight": (f"{p}/attn/k_norm/weight", None, ""),
                "mlp.gate_proj.weight": (f"{p}/mlp/gate_up/weight", 0, "t"),
                "mlp.up_proj.weight": (f"{p}/mlp/gate_up/weight", 1, "t"),
                "mlp.down_proj.weight": (f"{p}/mlp/down/weight", None, "t"),
                "input_layernorm.weight": (f"{p}/input_norm/weight", None, ""),
                "post_attention_layernorm.weight": (f"{p}/post_norm/weight", None, ""),
            }
            if sub in m:
                pname, slot, tf = m[sub]
                if "t" in tf:
                    arr = arr.T
                return [(pname, slot, arr)]
            return []
        return []


class Qwen2ForCausalLM(LlamaForCausalLM):
    """Qwen2/2.5 dense: Llama structure + QKV bias (handled via config)."""


class Qwen3ForCausalLM(LlamaForCausalLM):
    """Qwen3 dense: adds per-head q/k RMSNorm."""

    def __init__(self, config: ModelConfig):
        config.qk_norm = True
        super().__init__(config)
