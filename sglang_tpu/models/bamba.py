"""Bamba (IBM): hybrid Mamba-2 + periodic GQA attention causal LM.

Behavioral reference: srt/models/bamba.py + HF BambaForCausalLM
(modeling_bamba.py — BambaMixer is Mamba2Mixer numerics, attention uses
partial rotary). The NemotronH/Bamba class the VERDICT asks for: a
Mamba-2 backbone with `layers_block_type[i] == "attention"` layers using
the paged-KV machinery, SSD layers using slot-indexed conv/ssm state —
both in one HybridStatePool, like Jamba (mamba-1 flavor).
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
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaMLP
from sglang_tpu.models.mamba2 import (
    Mamba2Dims,
    mamba2_mixer,
    mamba2_specs,
    map_mamba2_mixer_weight,
)


class _BambaMambaDims(Mamba2Dims):
    """Bamba names its SSD fields mamba_* (mamba_n_heads, mamba_d_head,
    mamba_n_groups, ...) — adapt them onto the Mamba2Dims contract."""

    def __init__(self, hf):  # noqa: super().__init__ intentionally skipped
        hidden = hf.hidden_size
        self.d_inner = int(getattr(hf, "mamba_expand", 2) * hidden)
        self.d_state = int(getattr(hf, "mamba_d_state", 128))
        self.d_conv = int(getattr(hf, "mamba_d_conv", 4))
        self.n_heads = int(getattr(hf, "mamba_n_heads", 128))
        self.head_dim = int(
            getattr(hf, "mamba_d_head", self.d_inner // self.n_heads)
        )
        self.n_groups = int(getattr(hf, "mamba_n_groups", 1))
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.conv_bias = bool(getattr(hf, "mamba_conv_bias", True))
        self.proj_bias = bool(getattr(hf, "mamba_proj_bias", False))
        lim = getattr(hf, "time_step_limit", None) or (0.0, float("inf"))
        self.dt_min, self.dt_max = float(lim[0]), float(lim[1])
        self.norm_eps = float(getattr(hf, "rms_norm_eps", 1e-5))


class BambaAttention:
    """GQA with partial rotary (partial_rotary_factor, default 0.5)."""

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
                                        dt, False)
        pr = getattr(hf, "partial_rotary_factor", 0.5) or 0.5
        self.rope = RotaryEmbedding(
            self.hd, int(self.hd * pr), c.max_position_embeddings,
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
        q, k = self.rope(fb.positions, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        return self.o_proj(params, join(p, "o_proj"),
                           out.reshape(T, -1)), kv


class BambaForCausalLM:
    is_multimodal = False
    no_prefix_cache = True  # SSD state is not page-addressable
    is_recurrent = True
    hf_prefix = "model"

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.n_layers = config.num_hidden_layers
        self.eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.block_types = list(
            getattr(hf, "layers_block_type", ["mamba"] * self.n_layers)
        )
        self.mdims = _BambaMambaDims(hf)
        c = config
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.final_norm = RMSNorm(c.hidden_size, self.eps, c.dtype)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, c.dtype)
        self.attn_layers = {
            i: BambaAttention(c, i)
            for i in range(self.n_layers) if self.is_attn(i)
        }
        self.mlps = {i: LlamaMLP(c, i) for i in range(self.n_layers)}

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
            s[join(p, "pre_ff_norm/weight")] = ParamSpec((c.hidden_size,),
                                                         dt)
            if self.is_attn(i):
                s.update(self.attn_layers[i].specs(join(p, "attn")))
            else:
                s.update(mamba2_specs(self.mdims, join(p, "mamba"),
                                      c.hidden_size, dt))
            s.update(self.mlps[i].specs(join(p, "mlp")))
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
                out, conv_st, ssm_st = mamba2_mixer(
                    self.mdims, params, join(p, "mamba"), h, conv_st,
                    ssm_st, fb,
                )
                new_kv[i] = (conv_st, ssm_st)
            x = x + out
            h = self._rms(params, join(p, "pre_ff_norm/weight"), x, self.eps)
            x = x + self.mlps[i](params, join(p, "mlp"), h)
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
            b = {
                "self_attn.q_proj.bias": (f"{a}/q_proj/bias", None),
                "self_attn.k_proj.bias": (f"{a}/kv_proj/bias", 0),
                "self_attn.v_proj.bias": (f"{a}/kv_proj/bias", 1),
            }
            if sub in b:
                pn, slot = b[sub]
                return [(pn, slot, arr)]
            return []
        if sub.startswith("mamba."):
            return map_mamba2_mixer_weight(join(p, "mamba"),
                                           sub[len("mamba."):], arr)
        if sub.startswith("feed_forward."):
            mlp = join(p, "mlp")
            m = {
                "feed_forward.gate_proj.weight": (f"{mlp}/gate_up/weight", 0),
                "feed_forward.up_proj.weight": (f"{mlp}/gate_up/weight", 1),
                "feed_forward.down_proj.weight": (f"{mlp}/down/weight",
                                                  None),
            }
            if sub in m:
                pn, slot = m[sub]
                return [(pn, slot, arr.T)]
        return []
