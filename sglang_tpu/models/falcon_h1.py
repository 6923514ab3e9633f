"""FalconH1: parallel hybrid — every layer runs Mamba-2 AND attention.

Behavioral reference: srt/models/falcon_h1.py + HF FalconH1ForCausalLM:
each decoder layer feeds the same normed input to an SSD mixer and a
GQA attention in PARALLEL and sums the two (with mup multipliers
throughout: embedding / attention_in / attention_out / key / ssm_in /
ssm_out / mlp / lm_head, plus a per-section mup vector on the SSD
in_proj). Pool layout: 2 entries per layer — entry 2i is the paged
attention KV, entry 2i+1 the (conv, ssm) slot state — in one
HybridStatePool.
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
from sglang_tpu.models.mamba2 import (
    Mamba2Dims,
    mamba2_mixer,
    mamba2_specs,
    map_mamba2_mixer_weight,
)


class _FalconH1MambaDims(Mamba2Dims):
    def __init__(self, hf):  # noqa: super().__init__ intentionally skipped
        hidden = hf.hidden_size
        d_ssm = getattr(hf, "mamba_d_ssm", None)
        self.d_inner = int(
            d_ssm if d_ssm is not None
            else getattr(hf, "mamba_expand", 2) * hidden
        )
        self.d_state = int(getattr(hf, "mamba_d_state", 256))
        self.d_conv = int(getattr(hf, "mamba_d_conv", 4))
        self.n_heads = int(getattr(hf, "mamba_n_heads", 128))
        self.head_dim = int(
            getattr(hf, "mamba_d_head", None)
            or self.d_inner // self.n_heads
        )
        self.n_groups = int(getattr(hf, "mamba_n_groups", 1))
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.conv_bias = bool(getattr(hf, "mamba_conv_bias", True))
        self.proj_bias = bool(getattr(hf, "projectors_bias", False))
        lim = getattr(hf, "time_step_limit", None) or (0.0, float("inf"))
        self.dt_min, self.dt_max = float(lim[0]), float(lim[1])
        self.norm_eps = float(getattr(hf, "rms_norm_eps", 1e-5))


def _mup_vector(hf, m: _FalconH1MambaDims) -> np.ndarray:
    """compute_mup_vector: per-section multipliers [z, x, B, C, dt]."""
    I, GN, nh = m.d_inner, m.n_groups * m.d_state, m.n_heads
    mults = list(getattr(hf, "ssm_multipliers", None) or [1.0] * 5)
    v = np.ones(2 * I + 2 * GN + nh, np.float32)
    v[:I] *= mults[0]
    v[I:2 * I] *= mults[1]
    v[2 * I:2 * I + GN] *= mults[2]
    v[2 * I + GN:2 * I + 2 * GN] *= mults[3]
    v[2 * I + 2 * GN:] *= mults[4]
    return v


class FalconH1Attention:
    """GQA, full rotary, k scaled by key_multiplier before rope."""

    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        hf = c.hf_config
        self.layer_id = layer_id  # pool-entry index (2*i)
        self.nq = c.num_attention_heads
        self.nk = c.num_key_value_heads
        self.hd = c.head_dim
        self.key_mult = float(getattr(hf, "key_multiplier", 1.0) or 1.0)
        dt = c.dtype
        bias = bool(getattr(hf, "attention_bias", False))
        self.q_proj = ColumnParallelLinear(c.hidden_size, self.nq * self.hd,
                                           dt, bias)
        self.kv_proj = FusedColumnLinear(c.hidden_size, 2,
                                         self.nk * self.hd, dt, bias)
        self.o_proj = RowParallelLinear(self.nq * self.hd, c.hidden_size,
                                        dt, bias)
        self.rope = RotaryEmbedding(
            self.hd, None, c.max_position_embeddings,
            getattr(hf, "rope_theta", 100000.0),
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
        if self.key_mult != 1.0:
            k = k * jnp.asarray(self.key_mult, k.dtype)
        q, k = self.rope(fb.positions, q, k)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        return self.o_proj(params, join(p, "o_proj"),
                           out.reshape(T, -1)), kv


class FalconH1MLP:
    """Gated SiLU MLP with mlp_multipliers = [gate_mult, down_mult]."""

    def __init__(self, config: ModelConfig):
        c = config
        hf = c.hf_config
        dt = c.dtype
        bias = bool(getattr(hf, "mlp_bias", False))
        mm = list(getattr(hf, "mlp_multipliers", None) or [1.0, 1.0])
        self.gate_mult, self.down_mult = float(mm[0]), float(mm[1])
        self.gate_up = FusedColumnLinear(c.hidden_size, 2,
                                         c.intermediate_size, dt, bias)
        self.down = RowParallelLinear(c.intermediate_size, c.hidden_size,
                                      dt, bias)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.gate_up.specs(join(p, "gate_up")))
        s.update(self.down.specs(join(p, "down")))
        return s

    def __call__(self, params, p, x):
        gu = self.gate_up(params, join(p, "gate_up"), x)
        gate = gu[:, 0, :] * jnp.asarray(self.gate_mult, gu.dtype)
        y = gu[:, 1, :] * jax.nn.silu(gate)
        return self.down(params, join(p, "down"), y) * jnp.asarray(
            self.down_mult, gu.dtype
        )


class FalconH1ForCausalLM:
    is_multimodal = False
    no_prefix_cache = True
    is_recurrent = True
    hf_prefix = "model"

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.n_layers = config.num_hidden_layers
        self.eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.mdims = _FalconH1MambaDims(hf)
        self.mup = jnp.asarray(_mup_vector(hf, self.mdims))
        self.embed_mult = float(getattr(hf, "embedding_multiplier", 1.0)
                                or 1.0)
        self.attn_in = float(getattr(hf, "attention_in_multiplier", 1.0)
                             or 1.0)
        self.attn_out = float(getattr(hf, "attention_out_multiplier", 1.0)
                              or 1.0)
        self.ssm_in = float(getattr(hf, "ssm_in_multiplier", 1.0) or 1.0)
        self.ssm_out = float(getattr(hf, "ssm_out_multiplier", 1.0) or 1.0)
        self.head_mult = float(getattr(hf, "lm_head_multiplier", 1.0)
                               or 1.0)
        self.gated_rmsnorm = bool(getattr(hf, "mamba_rms_norm", False))
        self.norm_before_gate = bool(getattr(hf, "mamba_norm_before_gate",
                                             True))
        c = config
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.final_norm = RMSNorm(c.hidden_size, self.eps, c.dtype)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, c.dtype)
        self.attn_layers = [FalconH1Attention(c, 2 * i)
                            for i in range(self.n_layers)]
        self.mlps = [FalconH1MLP(c) for _ in range(self.n_layers)]

    # 2 pool entries per layer: [2i]=paged attention KV, [2i+1]=SSD state
    def state_shapes(self, num_slots: int) -> List[Optional[Tuple]]:
        m = self.mdims
        out: List[Optional[Tuple]] = []
        for _ in range(self.n_layers):
            out.append(None)
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
            s.update(self.attn_layers[i].specs(join(p, "attn")))
            s.update(mamba2_specs(self.mdims, join(p, "mamba"),
                                  c.hidden_size, dt,
                                  gated_rmsnorm=self.gated_rmsnorm))
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
        if self.embed_mult != 1.0:
            x = x * jnp.asarray(self.embed_mult, x.dtype)
        new_kv = list(kv)
        for i in range(self.n_layers):
            p = f"layers/{i}"
            h = self._rms(params, join(p, "input_norm/weight"), x, self.eps)
            conv_st, ssm_st = new_kv[2 * i + 1]
            m_out, conv_st, ssm_st = mamba2_mixer(
                self.mdims, params, join(p, "mamba"), h, conv_st, ssm_st,
                fb, norm_before_gate=self.norm_before_gate,
                grouped_norm=True, x_mult=self.ssm_in, mup=self.mup,
                gated_rmsnorm=self.gated_rmsnorm,
            )
            new_kv[2 * i + 1] = (conv_st, ssm_st)
            h_attn = (h * jnp.asarray(self.attn_in, h.dtype)
                      if self.attn_in != 1.0 else h)
            a_out, upd = self.attn_layers[i](
                params, join(p, "attn"), h_attn, fb, tuple(new_kv),
                attn_backend,
            )
            new_kv = list(upd)
            x = (x + m_out * jnp.asarray(self.ssm_out, x.dtype)
                 + a_out * jnp.asarray(self.attn_out, x.dtype))
            h = self._rms(params, join(p, "pre_ff_norm/weight"), x, self.eps)
            x = x + self.mlps[i](params, join(p, "mlp"), h)
        x = self._rms(params, "final_norm/weight", x, self.eps)
        return x, tuple(new_kv)

    def compute_logits(self, params, hidden):
        head = "embed" if self.config.tie_word_embeddings else "lm_head"
        logits = self.lm_head(params, head, hidden)
        if self.head_mult != 1.0:
            return logits * jnp.asarray(self.head_mult, logits.dtype)
        return logits

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
        p = f"layers/{int(idx_s)}"
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
                "self_attn.o_proj.bias": (f"{a}/o_proj/bias", None),
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
            b = {
                "feed_forward.gate_proj.bias": (f"{mlp}/gate_up/bias", 0),
                "feed_forward.up_proj.bias": (f"{mlp}/gate_up/bias", 1),
                "feed_forward.down_proj.bias": (f"{mlp}/down/bias", None),
            }
            if sub in b:
                pn, slot = b[sub]
                return [(pn, slot, arr)]
        return []
