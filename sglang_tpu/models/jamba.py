"""Jamba: hybrid attention + mamba-1 + MoE causal LM.

Behavioral reference: srt/models/jamba.py + HF JambaForCausalLM
(modeling_jamba.py slow_forward numerics). The hybrid class the VERDICT
asks for: periodic attention layers (i % attn_layer_period ==
attn_layer_offset) inside a mamba backbone, with MoE feed-forwards on a
second period. TPU-native state handling: attention layers use the paged
KV machinery (fb.page_table / out_cache_loc); mamba layers use
slot-indexed conv/ssm state arrays (fb.state_slots) — both live in one
HybridStatePool (mem/kv_pool.py), the analog of the reference's
HybridLinearKVPool (srt/mem_cache/memory_pool.py:3555).

Jamba specifics vs our other blocks:
- attention has NO rotary embedding (the model has no position encoding);
- the mamba mixer RMS-normalizes the dt/B/C selection slices
  (dt_layernorm/b_layernorm/c_layernorm) — mamba1_mixer(dtbc_norm_eps=·);
- MoE routing is softmax-then-topk over the full expert set
  (FusedMoE(renormalize=False)).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.layers.embedding import LMHead, VocabEmbedding
from sglang_tpu.layers.linear import (
    ColumnParallelLinear,
    FusedColumnLinear,
    RowParallelLinear,
)
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaMLP
from sglang_tpu.models.mamba import mamba1_mixer


class JambaAttention:
    """GQA attention WITHOUT rope (Jamba has no positional encoding)."""

    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        self.layer_id = layer_id
        self.nq = c.num_attention_heads
        self.nk = c.num_key_value_heads
        self.hd = c.head_dim
        dt = c.dtype
        self.q_proj = ColumnParallelLinear(c.hidden_size, self.nq * self.hd,
                                           dt, False)
        self.kv_proj = FusedColumnLinear(c.hidden_size, 2,
                                         self.nk * self.hd, dt, False)
        self.o_proj = RowParallelLinear(self.nq * self.hd, c.hidden_size,
                                        dt, False)

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
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        return self.o_proj(params, join(p, "o_proj"),
                           out.reshape(T, -1)), kv


class _JambaMambaDims:
    """Mixer dims/flags consumed by mamba1_mixer."""

    def __init__(self, hf):
        self.d_inner = int(hf.mamba_expand * hf.hidden_size)
        self.d_state = hf.mamba_d_state
        self.d_conv = hf.mamba_d_conv
        self.dt_rank = hf.mamba_dt_rank
        self.conv_bias = bool(getattr(hf, "mamba_conv_bias", True))
        self.proj_bias = bool(getattr(hf, "mamba_proj_bias", False))


class JambaForCausalLM:
    is_multimodal = False
    no_prefix_cache = True  # mamba state is not page-addressable
    is_recurrent = True
    hf_prefix = "model"

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.n_layers = config.num_hidden_layers
        self.eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.attn_period = hf.attn_layer_period
        self.attn_offset = hf.attn_layer_offset
        self.moe_period = hf.expert_layer_period
        self.moe_offset = hf.expert_layer_offset
        self.num_experts = getattr(hf, "num_experts", 1)
        self.mdims = _JambaMambaDims(hf)
        c = config
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.final_norm = RMSNorm(c.hidden_size, self.eps, c.dtype)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, c.dtype)
        self.attn_layers = {}
        self.ff_layers = {}
        for i in range(self.n_layers):
            if self.is_attn(i):
                self.attn_layers[i] = JambaAttention(c, i)
            if self.is_moe(i):
                self.ff_layers[i] = FusedMoE(
                    num_experts=self.num_experts,
                    top_k=hf.num_experts_per_tok,
                    hidden_size=c.hidden_size,
                    intermediate_size=c.intermediate_size,
                    dtype=c.dtype,
                    renormalize=False,  # softmax-then-topk (HF Jamba)
                )
            else:
                self.ff_layers[i] = LlamaMLP(c, i)

    def is_attn(self, i: int) -> bool:
        return i % self.attn_period == self.attn_offset

    def is_moe(self, i: int) -> bool:
        return (self.num_experts > 1
                and i % self.moe_period == self.moe_offset)

    # ---- pool layout: None = paged attention layer, tuple = SSM states
    def state_shapes(self, num_slots: int) -> List[Optional[Tuple]]:
        m = self.mdims
        out: List[Optional[Tuple]] = []
        for i in range(self.n_layers):
            if self.is_attn(i):
                out.append(None)
            else:
                out.append((
                    (num_slots + 1, m.d_conv - 1, m.d_inner),
                    (num_slots + 1, m.d_inner, m.d_state),
                ))
        return out

    def param_specs(self) -> SpecTree:
        c = self.config
        dt = c.dtype
        m = self.mdims
        H, I, S, R, K = (c.hidden_size, m.d_inner, m.d_state, m.dt_rank,
                         m.d_conv)
        s = {}
        s.update(self.embed.specs("embed"))
        s.update(self.final_norm.specs("final_norm"))
        if not c.tie_word_embeddings:
            s.update(self.lm_head.specs("lm_head"))
        for i in range(self.n_layers):
            p = f"layers/{i}"
            s[join(p, "input_norm/weight")] = ParamSpec((H,), dt)
            s[join(p, "pre_ff_norm/weight")] = ParamSpec((H,), dt)
            if self.is_attn(i):
                s.update(self.attn_layers[i].specs(join(p, "attn")))
            else:
                mp = join(p, "mamba")
                s[join(mp, "in_proj/weight")] = ParamSpec((H, 2 * I), dt)
                s[join(mp, "conv/weight")] = ParamSpec((K, I), dt)
                if m.conv_bias:
                    s[join(mp, "conv/bias")] = ParamSpec((I,), dt)
                s[join(mp, "x_proj/weight")] = ParamSpec((I, R + 2 * S), dt)
                s[join(mp, "dt_proj/weight")] = ParamSpec((R, I), dt)
                s[join(mp, "dt_proj/bias")] = ParamSpec((I,), dt)
                s[join(mp, "dt_norm/weight")] = ParamSpec((R,), dt)
                s[join(mp, "b_norm/weight")] = ParamSpec((S,), dt)
                s[join(mp, "c_norm/weight")] = ParamSpec((S,), dt)
                s[join(mp, "A_log")] = ParamSpec((I, S), jnp.float32)
                s[join(mp, "D")] = ParamSpec((I,), jnp.float32)
                s[join(mp, "out_proj/weight")] = ParamSpec((I, H), dt)
            s.update(self.ff_layers[i].specs(join(p, "mlp")))
        return s

    @staticmethod
    def _rms(params, key, x, eps):
        v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(v + eps)).astype(
            x.dtype
        ) * params[key]

    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None):
        x = self.embed(params, "embed", fb.input_ids)
        new_kv = list(kv)
        for i in range(self.n_layers):
            p = f"layers/{i}"
            h = self._rms(params, join(p, "input_norm/weight"), x, self.eps)
            if self.is_attn(i):
                out, upd = self.attn_layers[i](
                    params, join(p, "attn"), h, fb, tuple(new_kv),
                    attn_backend,
                )
                new_kv = list(upd)
            else:
                conv_st, ssm_st = new_kv[i]
                out, conv_st, ssm_st = mamba1_mixer(
                    self.mdims, params, join(p, "mamba"), h, conv_st,
                    ssm_st, fb, dtbc_norm_eps=self.eps,
                )
                new_kv[i] = (conv_st, ssm_st)
            x = x + out
            h = self._rms(params, join(p, "pre_ff_norm/weight"), x, self.eps)
            x = x + self.ff_layers[i](params, join(p, "mlp"), h)
        x = self._rms(params, "final_norm/weight", x, self.eps)
        return x, tuple(new_kv)

    def compute_logits(self, params, hidden):
        head = "embed" if self.config.tie_word_embeddings else "lm_head"
        return self.lm_head(params, head, hidden)

    # ---- HF weight mapping ----
    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name == "model.embed_tokens.weight":
            return [("embed/weight", None, arr)]
        if name == "lm_head.weight":
            if self.config.tie_word_embeddings:
                return []
            return [("lm_head/weight", None, arr)]
        if name == "model.final_layernorm.weight":
            return [("final_norm/weight", None, arr)]
        if not name.startswith("model.layers."):
            return []
        rest = name[len("model.layers."):]
        idx_s, sub = rest.split(".", 1)
        i = int(idx_s)
        p = f"layers/{i}"
        if sub == "input_layernorm.weight":
            return [(join(p, "input_norm/weight"), None, arr)]
        if sub == "pre_ff_layernorm.weight":
            return [(join(p, "pre_ff_norm/weight"), None, arr)]
        if sub.startswith("self_attn."):
            a = join(p, "attn")
            m = {
                "self_attn.q_proj.weight": (f"{a}/q_proj/weight", None),
                "self_attn.k_proj.weight": (f"{a}/kv_proj/weight", 0),
                "self_attn.v_proj.weight": (f"{a}/kv_proj/weight", 1),
                "self_attn.o_proj.weight": (f"{a}/o_proj/weight", None),
            }
            if sub in m:
                pn, slot = m[sub]
                return [(pn, slot, arr.T)]
            return []
        if sub.startswith("mamba."):
            mp = join(p, "mamba")
            m = {
                "mamba.in_proj.weight": ("in_proj/weight", "t"),
                "mamba.x_proj.weight": ("x_proj/weight", "t"),
                "mamba.dt_proj.weight": ("dt_proj/weight", "t"),
                "mamba.dt_proj.bias": ("dt_proj/bias", ""),
                "mamba.dt_layernorm.weight": ("dt_norm/weight", ""),
                "mamba.b_layernorm.weight": ("b_norm/weight", ""),
                "mamba.c_layernorm.weight": ("c_norm/weight", ""),
                "mamba.A_log": ("A_log", ""),
                "mamba.D": ("D", ""),
                "mamba.out_proj.weight": ("out_proj/weight", "t"),
                "mamba.conv1d.bias": ("conv/bias", ""),
            }
            if sub in m:
                ours, tf = m[sub]
                return [(join(mp, ours), None, arr.T if tf else arr)]
            if sub == "mamba.conv1d.weight":
                return [(join(mp, "conv/weight"), None, arr[:, 0, :].T)]
            return []
        if sub.startswith("feed_forward."):
            mlp = join(p, "mlp")
            if self.is_moe(i):
                if sub == "feed_forward.router.weight":
                    return [(f"{mlp}/router", None, arr.T)]
                parts = sub.split(".")
                if len(parts) >= 4 and parts[1] == "experts":
                    e = int(parts[2])
                    w = parts[3]
                    if w == "gate_proj":
                        return [(f"{mlp}/w_gate_up", ("expert_gate", e),
                                 arr.T)]
                    if w == "up_proj":
                        return [(f"{mlp}/w_gate_up", ("expert_up", e),
                                 arr.T)]
                    if w == "down_proj":
                        return [(f"{mlp}/w_down", ("expert_down", e),
                                 arr.T)]
                return []
            m = {
                "feed_forward.gate_proj.weight": (f"{mlp}/gate_up/weight", 0),
                "feed_forward.up_proj.weight": (f"{mlp}/gate_up/weight", 1),
                "feed_forward.down_proj.weight": (f"{mlp}/down/weight", None),
            }
            if sub in m:
                pn, slot = m[sub]
                return [(pn, slot, arr.T)]
            return []
        return []
