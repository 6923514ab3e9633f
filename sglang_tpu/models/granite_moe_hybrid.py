"""IBM Granite 4.0 hybrid: Mamba-2 backbone + attention layers + MoE.

Behavioral reference: srt/models/granitemoe.py lineage + HF
GraniteMoeHybridForCausalLM: `layer_types[i]` picks mamba (SSD, Bamba
numerics) or attention (no rope by default — position_embedding_type
None; attention_multiplier as softmax scale); every layer's FF is
top-k-renormalized MoE plus an always-on shared gated MLP; granite's
embedding/residual/logits multipliers throughout.
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
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.bamba import _BambaMambaDims
from sglang_tpu.models.mamba2 import (
    mamba2_mixer,
    mamba2_specs,
    map_mamba2_mixer_weight,
)


class _GmhAttention:
    """GQA; rope only if position_embedding_type == "rope"; softmax
    scale = attention_multiplier."""

    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        hf = c.hf_config
        self.layer_id = layer_id
        self.nq = c.num_attention_heads
        self.nk = c.num_key_value_heads
        self.hd = c.head_dim
        dt = c.dtype
        bias = bool(getattr(hf, "attention_bias", False))
        self.q_proj = ColumnParallelLinear(c.hidden_size, self.nq * self.hd,
                                           dt, bias)
        self.kv_proj = FusedColumnLinear(c.hidden_size, 2,
                                         self.nk * self.hd, dt, bias)
        self.o_proj = RowParallelLinear(self.nq * self.hd, c.hidden_size,
                                        dt, bias)
        self.attn_scale = float(
            getattr(hf, "attention_multiplier", None) or self.hd ** -0.5
        )
        self.rope = None
        if getattr(hf, "position_embedding_type", None) == "rope":
            self.rope = RotaryEmbedding(
                self.hd, None, c.max_position_embeddings,
                getattr(hf, "rope_theta", 10000.0),
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
        if self.rope is not None:
            q, k = self.rope(fb.positions, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb,
                               scale=self.attn_scale)
        return self.o_proj(params, join(p, "o_proj"),
                           out.reshape(T, -1)), kv


class _GmhSharedMLP:
    """Shared gated MLP: input_linear [H, 2*SI] (chunk0=gate, chunk1=up)."""

    def __init__(self, config: ModelConfig):
        c = config
        self.si = int(getattr(c.hf_config, "shared_intermediate_size",
                              c.intermediate_size))
        self.gate_up = FusedColumnLinear(c.hidden_size, 2, self.si,
                                         c.dtype, False)
        self.down = RowParallelLinear(self.si, c.hidden_size, c.dtype,
                                      False)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.gate_up.specs(join(p, "gate_up")))
        s.update(self.down.specs(join(p, "down")))
        return s

    def __call__(self, params, p, x):
        gu = self.gate_up(params, join(p, "gate_up"), x)
        y = jax.nn.silu(gu[:, 0, :]) * gu[:, 1, :]
        return self.down(params, join(p, "down"), y)


class GraniteMoeHybridForCausalLM:
    is_multimodal = False
    no_prefix_cache = True
    is_recurrent = True
    hf_prefix = "model"

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.n_layers = config.num_hidden_layers
        self.eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.block_types = list(
            getattr(hf, "layer_types", ["mamba"] * self.n_layers)
        )
        self.mdims = _BambaMambaDims(hf)
        self.embed_mult = float(getattr(hf, "embedding_multiplier", 1.0)
                                or 1.0)
        self.res_mult = float(getattr(hf, "residual_multiplier", 1.0)
                              or 1.0)
        self.logits_scale = float(getattr(hf, "logits_scaling", 1.0)
                                  or 1.0)
        self.num_experts = config.num_experts
        c = config
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.final_norm = RMSNorm(c.hidden_size, self.eps, c.dtype)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, c.dtype)
        self.attn_layers = {
            i: _GmhAttention(c, i)
            for i in range(self.n_layers) if self.is_attn(i)
        }
        self.moes = {}
        if self.num_experts > 1:
            for i in range(self.n_layers):
                self.moes[i] = FusedMoE(
                    num_experts=self.num_experts,
                    top_k=c.num_experts_per_tok,
                    hidden_size=c.hidden_size,
                    intermediate_size=c.intermediate_size,
                    dtype=c.dtype,
                    renormalize=True,  # softmax over top-k logits
                )
        self.shared_mlps = {i: _GmhSharedMLP(c)
                            for i in range(self.n_layers)}

    def is_attn(self, i: int) -> bool:
        return self.block_types[i] == "attention"

    def state_shapes(self, num_slots: int) -> List[Optional[Tuple]]:
        m = self.mdims
        out: List[Optional[Tuple]] = []
        for i in range(self.n_layers):
            if self.is_attn(i):
                out.append(None)
            else:
                out.append((
                    (num_slots + 1, m.d_conv - 1, m.conv_dim),
                    (num_slots + 1, m.n_heads, m.head_dim, m.d_state),
                ))
        return out

    def param_specs(self) -> SpecTree:
        c = self.config
        dt = c.dtype
        s = {}
        s.update(self.embed.specs("embed"))
        s.update(self.final_norm.specs("final_norm"))
        if not c.tie_word_embeddings:
            s.update(self.lm_head.specs("lm_head"))
        for i in range(self.n_layers):
            p = f"layers/{i}"
            s[join(p, "input_norm/weight")] = ParamSpec((c.hidden_size,), dt)
            s[join(p, "post_norm/weight")] = ParamSpec((c.hidden_size,), dt)
            if self.is_attn(i):
                s.update(self.attn_layers[i].specs(join(p, "attn")))
            else:
                s.update(mamba2_specs(self.mdims, join(p, "mamba"),
                                      c.hidden_size, dt))
            if i in self.moes:
                s.update(self.moes[i].specs(join(p, "moe")))
            s.update(self.shared_mlps[i].specs(join(p, "shared_mlp")))
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
        if self.embed_mult != 1.0:
            x = x * jnp.asarray(self.embed_mult, x.dtype)
        rm = self.res_mult
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
                out, conv_st, ssm_st = mamba2_mixer(
                    self.mdims, params, join(p, "mamba"), h, conv_st,
                    ssm_st, fb,
                )
                new_kv[i] = (conv_st, ssm_st)
            x = x + out * jnp.asarray(rm, out.dtype)
            h = self._rms(params, join(p, "post_norm/weight"), x, self.eps)
            ff = self.shared_mlps[i](params, join(p, "shared_mlp"), h)
            if i in self.moes:
                ff = ff + self.moes[i](params, join(p, "moe"), h)
            x = x + ff * jnp.asarray(rm, ff.dtype)
        x = self._rms(params, "final_norm/weight", x, self.eps)
        return x, tuple(new_kv)

    def compute_logits(self, params, hidden):
        head = "embed" if self.config.tie_word_embeddings else "lm_head"
        return self.lm_head(params, head, hidden) / self.logits_scale

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
            return map_mamba2_mixer_weight(join(p, "mamba"),
                                           sub[len("mamba."):], arr)
        if sub.startswith("shared_mlp."):
            mlp = join(p, "shared_mlp")
            if sub == "shared_mlp.input_linear.weight":
                si = arr.shape[0] // 2
                return [(f"{mlp}/gate_up/weight", 0, arr[:si].T),
                        (f"{mlp}/gate_up/weight", 1, arr[si:].T)]
            if sub == "shared_mlp.output_linear.weight":
                return [(f"{mlp}/down/weight", None, arr.T)]
            return []
        if sub.startswith("block_sparse_moe.") and i in self.moes:
            mp = join(p, "moe")
            if sub == "block_sparse_moe.router.layer.weight":
                return [(f"{mp}/router", None, arr.T)]
            E = self.num_experts
            if sub == "block_sparse_moe.input_linear.weight":
                I = arr.shape[1] // 2
                out = []
                for e in range(E):
                    out.append((f"{mp}/w_gate_up", ("expert_gate", e),
                                arr[e, :I, :].T))
                    out.append((f"{mp}/w_gate_up", ("expert_up", e),
                                arr[e, I:, :].T))
                return out
            if sub == "block_sparse_moe.output_linear.weight":
                return [(f"{mp}/w_down", ("expert_down", e), arr[e].T)
                        for e in range(E)]
        return []
