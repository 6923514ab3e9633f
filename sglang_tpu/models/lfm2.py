"""LFM2 (Liquid AI): hybrid short-conv + full-attention causal LM.

Behavioral reference: srt/layers/attention/linear/short_conv_backend.py
+ HF Lfm2ForCausalLM (slow_forward numerics). Short-conv layers are a
gated depthwise causal conv: in_proj -> [B, C, x], conv(B*x) over an
L_cache window (no activation), y = C * conv_out, out_proj — state is
the last L_cache-1 inputs per request slot (the short-conv member of
the linear-attention family; GDN lives in qwen3_next.py). Attention
layers are GQA with per-head q/k RMSNorm then rope, paged KV.
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
from sglang_tpu.layers.ragged_conv import (
    conv_state_writeback,
    seeded_causal_conv,
)
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch


def _lfm2_ff_dim(hf) -> int:
    ff = hf.intermediate_size
    if getattr(hf, "block_auto_adjust_ff_dim", False):
        ff = int(2 * ff / 3)
        mult = getattr(hf, "block_ffn_dim_multiplier", None)
        if mult is not None:
            ff = int(mult * ff)
        mo = getattr(hf, "block_multiple_of", 256)
        ff = mo * ((ff + mo - 1) // mo)
    return ff


class Lfm2Attention:
    """GQA with per-head q/k RMSNorm applied before rope."""

    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        hf = c.hf_config
        self.layer_id = layer_id
        self.nq = c.num_attention_heads
        self.nk = c.num_key_value_heads
        self.hd = c.head_dim
        self.eps = float(getattr(hf, "norm_eps", 1e-5))
        dt = c.dtype
        self.q_proj = ColumnParallelLinear(c.hidden_size, self.nq * self.hd,
                                           dt, False)
        self.kv_proj = FusedColumnLinear(c.hidden_size, 2,
                                         self.nk * self.hd, dt, False)
        self.o_proj = RowParallelLinear(self.nq * self.hd, c.hidden_size,
                                        dt, False)
        self.rope = RotaryEmbedding(
            self.hd, None, c.max_position_embeddings,
            getattr(hf, "rope_theta", 1000000.0),
            getattr(hf, "rope_scaling", None),
        )

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.q_proj.specs(join(p, "q_proj")))
        s.update(self.kv_proj.specs(join(p, "kv_proj")))
        s.update(self.o_proj.specs(join(p, "o_proj")))
        s[join(p, "q_norm/weight")] = ParamSpec((self.hd,),
                                                self.q_proj.dtype)
        s[join(p, "k_norm/weight")] = ParamSpec((self.hd,),
                                                self.q_proj.dtype)
        return s

    def _head_rms(self, params, key, x):
        v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(v + self.eps)
                ).astype(x.dtype) * params[key]

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend):
        T = x.shape[0]
        q = self.q_proj(params, join(p, "q_proj"), x).reshape(
            T, self.nq, self.hd
        )
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k = kv_new[:, 0, :].reshape(T, self.nk, self.hd)
        v = kv_new[:, 1, :].reshape(T, self.nk, self.hd)
        q = self._head_rms(params, join(p, "q_norm/weight"), q)
        k = self._head_rms(params, join(p, "k_norm/weight"), k)
        q, k = self.rope(fb.positions, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        return self.o_proj(params, join(p, "o_proj"),
                           out.reshape(T, -1)), kv


def short_conv_mixer(params, p, x, conv_st, fb: ForwardBatch,
                     conv_bias: bool):
    """LFM2 short conv block: y = C * conv(B * x_proj), out_proj."""
    H = x.shape[-1]
    proj = jnp.dot(x, params[join(p, "in_proj/weight")])  # [T, 3H]
    B = proj[:, :H]
    C = proj[:, H:2 * H]
    xs = proj[:, 2 * H:]
    Bx = B * xs
    w = params[join(p, "conv/weight")]  # [K, H]
    bias = params[join(p, "conv/bias")] if conv_bias else None
    conv_out = seeded_causal_conv(fb, Bx, conv_st, w, bias)
    y = C.astype(jnp.float32) * conv_out
    out = jnp.dot(y.astype(x.dtype), params[join(p, "out_proj/weight")])
    new_conv = conv_state_writeback(fb, Bx, conv_st)
    return out, new_conv


class Lfm2ForCausalLM:
    is_multimodal = False
    no_prefix_cache = True
    is_recurrent = True
    hf_prefix = "model"

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.n_layers = config.num_hidden_layers
        self.eps = float(getattr(hf, "norm_eps", 1e-5))
        self.block_types = list(
            getattr(hf, "layer_types", ["conv"] * self.n_layers)
        )
        self.L = int(getattr(hf, "conv_L_cache", 3))
        self.conv_bias = bool(getattr(hf, "conv_bias", False))
        self.ff_dim = _lfm2_ff_dim(hf)
        c = config
        dt = c.dtype
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, dt)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, dt)
        self.attn_layers = {
            i: Lfm2Attention(c, i)
            for i in range(self.n_layers) if self.is_attn(i)
        }
        self.ff_gate_up = FusedColumnLinear(c.hidden_size, 2, self.ff_dim,
                                            dt, False)
        self.ff_down = RowParallelLinear(self.ff_dim, c.hidden_size, dt,
                                         False)

    def is_attn(self, i: int) -> bool:
        return self.block_types[i] == "full_attention"

    def state_shapes(self, num_slots: int) -> List[Optional[Tuple]]:
        H = self.config.hidden_size
        out: List[Optional[Tuple]] = []
        for i in range(self.n_layers):
            if self.is_attn(i):
                out.append(None)
            else:
                out.append(((num_slots + 1, self.L - 1, H),))
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
        for i in range(self.n_layers):
            p = f"layers/{i}"
            s[join(p, "operator_norm/weight")] = ParamSpec((H,), dt)
            s[join(p, "ffn_norm/weight")] = ParamSpec((H,), dt)
            if self.is_attn(i):
                s.update(self.attn_layers[i].specs(join(p, "attn")))
            else:
                cp = join(p, "conv")
                s[join(cp, "in_proj/weight")] = ParamSpec((H, 3 * H), dt)
                s[join(cp, "conv/weight")] = ParamSpec((self.L, H), dt)
                if self.conv_bias:
                    s[join(cp, "conv/bias")] = ParamSpec((H,), dt)
                s[join(cp, "out_proj/weight")] = ParamSpec((H, H), dt)
            s.update(self.ff_gate_up.specs(join(p, "mlp/gate_up")))
            s.update(self.ff_down.specs(join(p, "mlp/down")))
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
            h = self._rms(params, join(p, "operator_norm/weight"), x,
                          self.eps)
            if self.is_attn(i):
                out, upd = self.attn_layers[i](
                    params, join(p, "attn"), h, fb, tuple(new_kv),
                    attn_backend,
                )
                new_kv = list(upd)
            else:
                (conv_st,) = new_kv[i]
                out, conv_st = short_conv_mixer(
                    params, join(p, "conv"), h, conv_st, fb,
                    self.conv_bias,
                )
                new_kv[i] = (conv_st,)
            x = x + out
            h = self._rms(params, join(p, "ffn_norm/weight"), x, self.eps)
            gu = self.ff_gate_up(params, join(p, "mlp/gate_up"), h)
            y = jax.nn.silu(gu[:, 0, :]) * gu[:, 1, :]
            x = x + self.ff_down(params, join(p, "mlp/down"), y)
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
        if name == "model.embedding_norm.weight":
            return [("final_norm/weight", None, arr)]
        if not name.startswith("model.layers."):
            return []
        rest = name[len("model.layers."):]
        idx_s, sub = rest.split(".", 1)
        p = f"layers/{int(idx_s)}"
        if sub == "operator_norm.weight":
            return [(join(p, "operator_norm/weight"), None, arr)]
        if sub == "ffn_norm.weight":
            return [(join(p, "ffn_norm/weight"), None, arr)]
        if sub.startswith("self_attn."):
            a = join(p, "attn")
            m = {
                "self_attn.q_proj.weight": (f"{a}/q_proj/weight", None),
                "self_attn.k_proj.weight": (f"{a}/kv_proj/weight", 0),
                "self_attn.v_proj.weight": (f"{a}/kv_proj/weight", 1),
                "self_attn.out_proj.weight": (f"{a}/o_proj/weight", None),
            }
            if sub in m:
                pn, slot = m[sub]
                return [(pn, slot, arr.T)]
            if sub == "self_attn.q_layernorm.weight":
                return [(f"{a}/q_norm/weight", None, arr)]
            if sub == "self_attn.k_layernorm.weight":
                return [(f"{a}/k_norm/weight", None, arr)]
            return []
        if sub.startswith("conv."):
            cp = join(p, "conv")
            if sub == "conv.in_proj.weight":
                return [(join(cp, "in_proj/weight"), None, arr.T)]
            if sub == "conv.conv.weight":
                # HF [H, 1, K] -> ours [K, H]
                return [(join(cp, "conv/weight"), None, arr[:, 0, :].T)]
            if sub == "conv.conv.bias":
                return [(join(cp, "conv/bias"), None, arr)]
            if sub == "conv.out_proj.weight":
                return [(join(cp, "out_proj/weight"), None, arr.T)]
            return []
        if sub.startswith("feed_forward."):
            mlp = join(p, "mlp")
            m = {
                "feed_forward.w1.weight": (f"{mlp}/gate_up/weight", 0),
                "feed_forward.w3.weight": (f"{mlp}/gate_up/weight", 1),
                "feed_forward.w2.weight": (f"{mlp}/down/weight", None),
            }
            if sub in m:
                pn, slot = m[sub]
                return [(pn, slot, arr.T)]
        return []
