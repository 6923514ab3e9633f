"""MiniMax-Text-01 class: lightning (linear) attention + full attention
+ Mixtral-style MoE, post-norm residual scaling.

Behavioral reference: srt/layers/attention/linear/lightning_backend.py +
HF MiniMaxForCausalLM. Lightning layers keep a per-request [nh, hd, hd]
decayed KV-outer-product state in the slot pool (the lightning member of
the linear-attention family; GDN = qwen3_next.py, short-conv = lfm2.py):

    h_t = exp(-slope_h) * h_{t-1} + k_t ⊗ v_t      out_t = q_t @ h_t

with per-head slopes from the layer index, silu on the fused qkv
projection, RMSNorm + sigmoid output gate. HF's chunked-block prefill is
this same recurrence unrolled, so a per-token scan is numerically
equivalent. Residuals are MiniMax's post-norm form:
x = norm(x)*alpha + sublayer*beta (the normed value is the residual).
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
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch


def lightning_slopes(n_heads: int, layer_id: int, n_layers: int
                     ) -> np.ndarray:
    """Per-head decay slopes (HF get_slope_rate)."""
    base = 1.0 / (2.0 ** (8.0 / n_heads))
    exponent = np.arange(1, n_heads + 1, dtype=np.float64)
    factor = 1.0 - layer_id / (n_layers - 1 + 1e-5) + 1e-5
    return (base ** exponent * factor).astype(np.float32)  # [nh]


def lightning_mixer(params, p, x, st, fb: ForwardBatch, nh: int, hd: int,
                    slopes: jax.Array, eps: float):
    """One lightning-attention block over the ragged stream. x [T, H]."""
    T = x.shape[0]
    qkv = jax.nn.silu(jnp.dot(x, params[join(p, "qkv_proj/weight")]))
    qkv = qkv.reshape(T, nh, 3 * hd).astype(jnp.float32)
    q = qkv[:, :, :hd]
    k = qkv[:, :, hd:2 * hd]
    v = qkv[:, :, 2 * hd:]

    sid = fb.seq_ids
    offs = jnp.arange(T, dtype=jnp.int32) - fb.cu_q_lens[sid]
    bslots = (fb.state_slots if fb.state_slots is not None
              else fb.req_slots)
    slot = bslots[sid]
    fresh_req = (fb.prefix_lens[sid] == 0)
    init = jnp.where(
        (fresh_req[:, None, None, None]), 0.0, st.astype(jnp.float32)[slot]
    )  # [T, nh, hd, hd]
    fresh = (offs == 0)[:, None, None, None]
    ratio = jnp.exp(-slopes)[:, None, None]  # [nh, 1, 1]

    kv_outer = k[:, :, :, None] * v[:, :, None, :]  # [T, nh, hd, hd]

    def step(h_prev, inp):
        kv_t, fr, h_init = inp
        h_in = jnp.where(fr, h_init, h_prev)
        h = ratio * h_in + kv_t
        return h, h

    _, hs = jax.lax.scan(
        step, jnp.zeros((nh, hd, hd), jnp.float32),
        (kv_outer, fresh, init),
    )  # [T, nh, hd, hd]
    y = jnp.einsum("thd,thdk->thk", q, hs)  # [T, nh, hd]
    y = y.reshape(T, nh * hd)
    # RMSNorm over the flattened heads, then sigmoid output gate
    var = jnp.mean(jnp.square(y), axis=-1, keepdims=True)
    y = y * jax.lax.rsqrt(var + eps) * params[join(p, "norm/weight")]
    gate = jax.nn.sigmoid(
        jnp.dot(x, params[join(p, "output_gate/weight")])
    ).astype(jnp.float32)
    y = (y * gate).astype(x.dtype)
    out = jnp.dot(y, params[join(p, "out_proj/weight")])

    last_rows = fb.cu_q_lens[:-1] + jnp.maximum(fb.q_lens - 1, 0)
    new_st = st.at[bslots].set(hs[last_rows].astype(st.dtype))
    return out, new_st


class MiniMaxFullAttention:
    """Standard GQA with rope (mixtral lineage)."""

    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        hf = c.hf_config
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
        self.rope = RotaryEmbedding(
            self.hd, getattr(hf, "rotary_dim", None),
            c.max_position_embeddings,
            getattr(hf, "rope_theta", 1000000.0),
            getattr(hf, "rope_scaling", None),
        )

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
        q, k = self.rope(fb.positions, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        return self.o_proj(params, join(p, "o_proj"),
                           out.reshape(T, -1)), kv


class MiniMaxForCausalLM:
    is_multimodal = False
    no_prefix_cache = True
    is_recurrent = True
    hf_prefix = "model"

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.n_layers = config.num_hidden_layers
        self.eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.block_types = list(
            getattr(hf, "layer_types", None)
            or ["full_attention" if i % 2 == 0 else "linear_attention"
                for i in range(self.n_layers)]
        )
        self.nq = config.num_attention_heads
        self.hd = config.head_dim
        g = lambda k, d: float(getattr(hf, k, d) or d)
        self.attn_alpha = {
            True: g("full_attn_alpha_factor", 1.0),
            False: g("linear_attn_alpha_factor", 1.0),
        }
        self.attn_beta = {
            True: g("full_attn_beta_factor", 1.0),
            False: g("linear_attn_beta_factor", 1.0),
        }
        self.mlp_alpha = g("mlp_alpha_factor", 1.0)
        self.mlp_beta = g("mlp_beta_factor", 1.0)
        c = config
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, c.dtype)
        self.attn_layers = {
            i: MiniMaxFullAttention(c, i)
            for i in range(self.n_layers) if self.is_attn(i)
        }
        self.slopes = {
            i: jnp.asarray(lightning_slopes(self.nq, i, self.n_layers))
            for i in range(self.n_layers) if not self.is_attn(i)
        }
        self.moes = {
            i: FusedMoE(
                num_experts=c.num_experts,
                top_k=c.num_experts_per_tok,
                hidden_size=c.hidden_size,
                intermediate_size=c.intermediate_size,
                dtype=c.dtype,
                renormalize=True,
            )
            for i in range(self.n_layers)
        }

    def is_attn(self, i: int) -> bool:
        return self.block_types[i] == "full_attention"

    def state_shapes(self, num_slots: int) -> List[Optional[Tuple]]:
        out: List[Optional[Tuple]] = []
        for i in range(self.n_layers):
            if self.is_attn(i):
                out.append(None)
            else:
                out.append(
                    ((num_slots + 1, self.nq, self.hd, self.hd),)
                )
        return out

    def param_specs(self) -> SpecTree:
        c = self.config
        dt = c.dtype
        H = c.hidden_size
        s = {}
        s.update(self.embed.specs("embed"))
        s["final_norm/weight"] = ParamSpec((H,), dt)
        if not c.tie_word_embeddings:
            s.update(self.lm_head.specs("lm_head"))
        nhd = self.nq * self.hd
        for i in range(self.n_layers):
            p = f"layers/{i}"
            s[join(p, "input_norm/weight")] = ParamSpec((H,), dt)
            s[join(p, "post_norm/weight")] = ParamSpec((H,), dt)
            if self.is_attn(i):
                s.update(self.attn_layers[i].specs(join(p, "attn")))
            else:
                a = join(p, "attn")
                s[join(a, "qkv_proj/weight")] = ParamSpec((H, 3 * nhd), dt)
                s[join(a, "output_gate/weight")] = ParamSpec((H, nhd), dt)
                s[join(a, "norm/weight")] = ParamSpec((nhd,), jnp.float32)
                s[join(a, "out_proj/weight")] = ParamSpec((nhd, H), dt)
            s.update(self.moes[i].specs(join(p, "moe")))
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
            is_attn = self.is_attn(i)
            h = self._rms(params, join(p, "input_norm/weight"), x, self.eps)
            if is_attn:
                out, upd = self.attn_layers[i](
                    params, join(p, "attn"), h, fb, tuple(new_kv),
                    attn_backend,
                )
                new_kv = list(upd)
            else:
                (st,) = new_kv[i]
                out, st = lightning_mixer(
                    params, join(p, "attn"), h, st, fb, self.nq, self.hd,
                    self.slopes[i], self.eps,
                )
                new_kv[i] = (st,)
            # post-norm residual: the NORMED value is the residual
            x = (h * jnp.asarray(self.attn_alpha[is_attn], h.dtype)
                 + out * jnp.asarray(self.attn_beta[is_attn], out.dtype))
            h = self._rms(params, join(p, "post_norm/weight"), x, self.eps)
            ff = self.moes[i](params, join(p, "moe"), h)
            x = (h * jnp.asarray(self.mlp_alpha, h.dtype)
                 + ff * jnp.asarray(self.mlp_beta, ff.dtype))
        x = self._rms(params, "final_norm/weight", x, self.eps)
        return x, tuple(new_kv)

    def compute_logits(self, params, hidden):
        head = "embed" if self.config.tie_word_embeddings else "lm_head"
        return self.lm_head(params, head, hidden)

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name == "model.embed_tokens.weight":
            return [("embed/weight", None, arr)]
        if name == "lm_head.weight":
            if self.config.tie_word_embeddings:
                return []
            return [("lm_head/weight", None, arr)]
        if name == "model.norm.weight":
            return [("final_norm/weight", None, arr)]
        if not name.startswith("model.layers."):
            return []
        rest = name[len("model.layers."):]
        idx_s, sub = rest.split(".", 1)
        i = int(idx_s)
        p = f"layers/{i}"
        if sub == "input_layernorm.weight":
            return [(join(p, "input_norm/weight"), None, arr)]
        if sub == "post_attention_layernorm.weight":
            return [(join(p, "post_norm/weight"), None, arr)]
        if sub.startswith("self_attn."):
            a = join(p, "attn")
            if self.is_attn(i):
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
            m = {
                "self_attn.qkv_proj.weight": (f"{a}/qkv_proj/weight", "t"),
                "self_attn.output_gate.weight": (f"{a}/output_gate/weight",
                                                 "t"),
                "self_attn.out_proj.weight": (f"{a}/out_proj/weight", "t"),
                "self_attn.norm.weight": (f"{a}/norm/weight", ""),
            }
            if sub in m:
                pn, tf = m[sub]
                return [(pn, None, arr.T if tf else arr)]
            return []
        if sub.startswith("block_sparse_moe."):
            mp = join(p, "moe")
            if sub == "block_sparse_moe.gate.weight":
                return [(f"{mp}/router", None, arr.T)]
            parts = sub.split(".")
            if len(parts) >= 4 and parts[1] == "experts":
                e = int(parts[2])
                w = parts[3]
                if w == "w1":
                    return [(f"{mp}/w_gate_up", ("expert_gate", e), arr.T)]
                if w == "w3":
                    return [(f"{mp}/w_gate_up", ("expert_up", e), arr.T)]
                if w == "w2":
                    return [(f"{mp}/w_down", ("expert_down", e), arr.T)]
        return []
