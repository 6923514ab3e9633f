"""Qwen3-Next: hybrid Gated-DeltaNet (linear attention) + gated full
attention + MoE causal LM.

Behavioral reference: srt/models/qwen3_next.py + HF modeling_qwen3_next
(the parity oracle; torch_chunk/recurrent_gated_delta_rule numerics).
Layer schedule comes from config.layer_types: "linear_attention" layers
run the GDN mixer (layers/linear_attn.py — short conv + delta-rule
recurrent state in the slot-indexed state pool), "full_attention" layers
run GQA with an output sigmoid gate, head-dim q/k RMSNorm and partial
(0.25) neox rope through the paged KV machinery. Feed-forwards are MoE
(shared expert + sigmoid shared gate, Qwen2-MoE semantics) on sparse
layers, dense MLP elsewhere (mlp_only_layers / decoder_sparse_step).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.layers.embedding import LMHead, VocabEmbedding
from sglang_tpu.layers.linear_attn import (
    causal_segment_conv,
    gated_delta_rule,
    l2norm,
)
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaMLP
from sglang_tpu.models.qwen2_moe import Qwen2MoeSparseBlock


class Qwen3NextAttention(LlamaAttention):
    """Full-attention layers: output-gated GQA + qk head norm + partial
    rope (HF Qwen3NextAttention)."""

    def __init__(self, config: ModelConfig, layer_id: int):
        config.qk_norm = True
        super().__init__(config, layer_id)
        c = config
        from sglang_tpu.layers.linear import ColumnParallelLinear

        # q_proj emits query AND gate (2x width, chunked per head).
        self.q_proj = ColumnParallelLinear(
            c.hidden_size, self.nq * self.hd * 2, c.dtype, c.attention_bias
        )
        factor = float(
            getattr(c.hf_config, "partial_rotary_factor", 0.25) or 0.25
        )
        self.rotary = RotaryEmbedding(
            self.hd, int(self.hd * factor), c.context_length, c.rope_theta,
            c.rope_scaling,
        )

    def __call__(self, params, p, x, fb, kv, attn_backend, lora=None):
        T = x.shape[0]
        qg = self.q_proj(params, join(p, "q_proj"), x).reshape(
            T, self.nq, 2 * self.hd
        )
        q, gate = qg[..., : self.hd], qg[..., self.hd :]
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k = kv_new[:, 0, :].reshape(T, self.nk, self.hd)
        v = kv_new[:, 1, :].reshape(T, self.nk, self.hd)
        q = self.qk_norm(params, join(p, "q_norm"), q)
        k = self.qk_norm(params, join(p, "k_norm"), k)
        q, k = self.rotary(fb.positions, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        out = out.reshape(T, -1) * jax.nn.sigmoid(
            gate.reshape(T, -1).astype(jnp.float32)
        ).astype(out.dtype)
        return self.o_proj(params, join(p, "o_proj"), out), kv


class _GdnDims:
    def __init__(self, hf):
        self.nk = hf.linear_num_key_heads
        self.nv = hf.linear_num_value_heads
        self.dk = hf.linear_key_head_dim
        self.dv = hf.linear_value_head_dim
        self.K = hf.linear_conv_kernel_dim
        self.key_dim = self.dk * self.nk
        self.value_dim = self.dv * self.nv
        self.conv_dim = 2 * self.key_dim + self.value_dim
        self.r = self.nv // self.nk  # v-heads per k-head


def gdn_mixer(m: _GdnDims, params, p, x, conv_st, rec_st,
              fb: ForwardBatch, eps: float):
    """One Gated-DeltaNet block over the ragged stream (HF
    Qwen3NextGatedDeltaNet.forward numerics, TPU ragged recast)."""
    T = x.shape[0]
    qkvz = jnp.dot(x, params[join(p, "in_proj_qkvz/weight")])
    ba = jnp.dot(x, params[join(p, "in_proj_ba/weight")])
    # per-k-head interleaved layout (HF fix_query_key_value_ordering)
    qkvz = qkvz.reshape(T, m.nk, 2 * m.dk + 2 * m.r * m.dv)
    q = qkvz[..., : m.dk].reshape(T, m.key_dim)
    k = qkvz[..., m.dk : 2 * m.dk].reshape(T, m.key_dim)
    v = qkvz[..., 2 * m.dk : 2 * m.dk + m.r * m.dv].reshape(T, m.value_dim)
    z = qkvz[..., 2 * m.dk + m.r * m.dv :].reshape(T, m.nv, m.dv)
    ba = ba.reshape(T, m.nk, 2 * m.r)
    b = ba[..., : m.r].reshape(T, m.nv)
    a = ba[..., m.r :].reshape(T, m.nv)

    # short causal conv over [q|k|v] with silu
    mixed = jnp.concatenate([q, k, v], axis=-1)  # [T, conv_dim]
    conv_out, conv_st = causal_segment_conv(
        mixed, params[join(p, "conv/weight")], None, fb, conv_st
    )
    conv_out = jax.nn.silu(conv_out)  # f32
    q = conv_out[:, : m.key_dim].reshape(T, m.nk, m.dk)
    k = conv_out[:, m.key_dim : 2 * m.key_dim].reshape(T, m.nk, m.dk)
    v = conv_out[:, 2 * m.key_dim :].reshape(T, m.nv, m.dv)

    q = l2norm(q) * (m.dk ** -0.5)
    k = l2norm(k)
    if m.r > 1:
        q = jnp.repeat(q, m.r, axis=1)
        k = jnp.repeat(k, m.r, axis=1)

    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    g = -jnp.exp(params[join(p, "A_log")].astype(jnp.float32)) * (
        jax.nn.softplus(
            a.astype(jnp.float32) + params[join(p, "dt_bias")].astype(
                jnp.float32
            )
        )
    )  # [T, nv]

    out, rec_st = gated_delta_rule(q, k, v, g, beta, fb, rec_st)

    # gated RMSNorm (norm THEN * silu(z)) per v-head, f32
    w = params[join(p, "norm/weight")].astype(jnp.float32)
    var = jnp.mean(jnp.square(out), axis=-1, keepdims=True)
    out = out * jax.lax.rsqrt(var + eps) * w
    out = out * jax.nn.silu(z.astype(jnp.float32))
    out = out.reshape(T, m.value_dim).astype(x.dtype)
    return jnp.dot(out, params[join(p, "out_proj/weight")]), conv_st, rec_st


class Qwen3NextForCausalLM:
    is_multimodal = False
    no_prefix_cache = True  # recurrent state is not page-addressable
    is_recurrent = True
    hf_prefix = "model"

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        hf = c.hf_config
        self.eps = c.rms_norm_eps
        self.n_layers = c.num_hidden_layers
        self.layer_types = list(hf.layer_types)
        self.gdn = _GdnDims(hf)
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.final_norm = RMSNorm(c.hidden_size, self.eps, c.dtype)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, c.dtype)
        self.attn_layers = {}
        self.ff_layers = {}
        sparse_step = int(getattr(hf, "decoder_sparse_step", 1) or 1)
        mlp_only = set(getattr(hf, "mlp_only_layers", []) or [])
        for i in range(self.n_layers):
            if self.is_attn(i):
                self.attn_layers[i] = Qwen3NextAttention(c, i)
            if (c.num_experts > 0 and i not in mlp_only
                    and (i + 1) % sparse_step == 0):
                self.ff_layers[i] = Qwen2MoeSparseBlock(c, shared_expert=True)
            else:
                self.ff_layers[i] = LlamaMLP(c, i)
        # HybridStatePool layout consumes attn.window per layer off the
        # decoder_layers attr; expose a minimal view for _layer_windows.
        self.decoder_layers = [
            type("L", (), {"attn": self.attn_layers.get(i)})()
            for i in range(self.n_layers)
        ]

    def is_attn(self, i: int) -> bool:
        return self.layer_types[i] == "full_attention"

    # ---- pool layout: None = paged attention layer, tuple = GDN states
    def state_shapes(self, num_slots: int) -> List[Optional[Tuple]]:
        m = self.gdn
        out: List[Optional[Tuple]] = []
        for i in range(self.n_layers):
            if self.is_attn(i):
                out.append(None)
            else:
                out.append((
                    (num_slots + 1, m.K - 1, m.conv_dim),
                    (num_slots + 1, m.nv, m.dk, m.dv),
                ))
        return out

    def param_specs(self) -> SpecTree:
        c = self.config
        dt = c.dtype
        m = self.gdn
        H = c.hidden_size
        s = {}
        s.update(self.embed.specs("embed"))
        s.update(self.final_norm.specs("final_norm"))
        if not c.tie_word_embeddings:
            s.update(self.lm_head.specs("lm_head"))
        for i in range(self.n_layers):
            p = f"layers/{i}"
            s[join(p, "input_norm/weight")] = ParamSpec((H,), dt)
            s[join(p, "post_norm/weight")] = ParamSpec((H,), dt)
            if self.is_attn(i):
                s.update(self.attn_layers[i].specs(join(p, "attn")))
            else:
                gp = join(p, "gdn")
                qkvz = 2 * m.key_dim + 2 * m.value_dim
                s[join(gp, "in_proj_qkvz/weight")] = ParamSpec((H, qkvz), dt)
                s[join(gp, "in_proj_ba/weight")] = ParamSpec(
                    (H, 2 * m.nv), dt
                )
                s[join(gp, "conv/weight")] = ParamSpec((m.K, m.conv_dim), dt)
                s[join(gp, "dt_bias")] = ParamSpec((m.nv,), jnp.float32)
                s[join(gp, "A_log")] = ParamSpec((m.nv,), jnp.float32)
                s[join(gp, "norm/weight")] = ParamSpec((m.dv,), dt)
                s[join(gp, "out_proj/weight")] = ParamSpec(
                    (m.value_dim, H), dt
                )
            s.update(self.ff_layers[i].specs(join(p, "mlp")))
        return s

    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None):
        x = self.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        new_kv = list(kv)
        norm = RMSNorm(self.config.hidden_size, self.eps, self.config.dtype)
        for i in range(self.n_layers):
            p = f"layers/{i}"
            h = norm(params, join(p, "input_norm"), x)
            if self.is_attn(i):
                out, upd = self.attn_layers[i](
                    params, join(p, "attn"), h, fb, tuple(new_kv),
                    attn_backend,
                )
                new_kv = list(upd)
            else:
                conv_st, rec_st = new_kv[i]
                out, conv_st, rec_st = gdn_mixer(
                    self.gdn, params, join(p, "gdn"), h, conv_st, rec_st,
                    fb, self.eps,
                )
                new_kv[i] = (conv_st, rec_st)
            x = x + out
            h = norm(params, join(p, "post_norm"), x)
            x = x + self.ff_layers[i](params, join(p, "mlp"), h)
        x = self.final_norm(params, "final_norm", x)
        return x, tuple(new_kv)

    def compute_logits(self, params, hidden):
        head = "embed" if self.config.tie_word_embeddings else "lm_head"
        return self.lm_head(params, head, hidden)

    # ---- HF weight mapping ----
    # HF Qwen3NextRMSNorm is zero-centered: out = norm(x) * (1 + w),
    # weights init/stored around 0. Our RMSNorm computes norm(x) * w, so
    # those weights (input/post/final/q/k norms) load as w+1. The GDN
    # gated norm (Qwen3NextRMSNormGated) is ones-centered — loaded as-is.
    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name == "model.embed_tokens.weight":
            return [("embed/weight", None, arr)]
        if name == "lm_head.weight":
            if self.config.tie_word_embeddings:
                return []
            return [("lm_head/weight", None, arr)]
        if name == "model.norm.weight":
            return [("final_norm/weight", None, arr + 1.0)]
        if not name.startswith("model.layers."):
            return []
        rest = name[len("model.layers."):]
        idx_s, sub = rest.split(".", 1)
        i = int(idx_s)
        p = f"layers/{i}"
        if sub == "input_layernorm.weight":
            return [(join(p, "input_norm/weight"), None, arr + 1.0)]
        if sub == "post_attention_layernorm.weight":
            return [(join(p, "post_norm/weight"), None, arr + 1.0)]
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
            if sub == "self_attn.q_norm.weight":
                return [(f"{a}/q_norm/weight", None, arr + 1.0)]
            if sub == "self_attn.k_norm.weight":
                return [(f"{a}/k_norm/weight", None, arr + 1.0)]
            return []
        if sub.startswith("linear_attn."):
            gp = join(p, "gdn")
            m = {
                "linear_attn.in_proj_qkvz.weight":
                    (f"{gp}/in_proj_qkvz/weight", "t"),
                "linear_attn.in_proj_ba.weight":
                    (f"{gp}/in_proj_ba/weight", "t"),
                "linear_attn.dt_bias": (f"{gp}/dt_bias", ""),
                "linear_attn.A_log": (f"{gp}/A_log", ""),
                "linear_attn.norm.weight": (f"{gp}/norm/weight", ""),
                "linear_attn.out_proj.weight":
                    (f"{gp}/out_proj/weight", "t"),
            }
            if sub in m:
                pn, tf = m[sub]
                return [(pn, None, arr.T if tf else arr)]
            if sub == "linear_attn.conv1d.weight":
                # HF depthwise conv [C, 1, K] -> ours [K, C]
                return [(f"{gp}/conv/weight", None, arr[:, 0, :].T)]
            return []
        if sub.startswith("mlp."):
            mp = f"{p}/mlp"
            if sub == "mlp.gate.weight":
                return [(f"{mp}/router", None, arr.T)]
            if sub == "mlp.shared_expert_gate.weight":
                return [(f"{mp}/shared_gate", None, arr.T)]
            if sub.startswith("mlp.shared_expert."):
                w = sub.split(".")[2]
                m = {
                    "gate_proj": (f"{mp}/shared_gate_up/weight", 0),
                    "up_proj": (f"{mp}/shared_gate_up/weight", 1),
                    "down_proj": (f"{mp}/shared_down/weight", None),
                }
                pn, slot = m[w]
                return [(pn, slot, arr.T)]
            if sub.startswith("mlp.experts."):
                parts = sub.split(".")
                e = int(parts[2])
                w = parts[3]
                m = {
                    "gate_proj": ("expert_gate", e),
                    "up_proj": ("expert_up", e),
                    "down_proj": ("expert_down", e),
                }
                return [(
                    f"{mp}/w_gate_up" if w != "down_proj"
                    else f"{mp}/w_down",
                    m[w], arr.T,
                )]
            # dense-MLP layers
            m = {
                "mlp.gate_proj.weight": (f"{mp}/gate_up/weight", 0),
                "mlp.up_proj.weight": (f"{mp}/gate_up/weight", 1),
                "mlp.down_proj.weight": (f"{mp}/down/weight", None),
            }
            if sub in m:
                pn, slot = m[sub]
                return [(pn, slot, arr.T)]
        return []
