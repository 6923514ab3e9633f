"""Mamba-2 (SSD / state-space duality) mixer + causal LM.

Behavioral reference: srt/layers/attention/mamba/ (mamba2 path) + HF
Mamba2Mixer.torch_forward numerics. The mixer is shared by the hybrid
families (Bamba, FalconH1, NemotronH-class) the way mamba1_mixer is
shared by Jamba. State layout per layer in the slot-indexed pool:

    conv_state [S+1, K-1, conv_dim]       conv_dim = I + 2*G*N
    ssm_state  [S+1, nh, hd, N]           per-head SSD state

The ragged stream runs the same seeded-conv + per-token scan scheme as
mamba1 (chunked prefill restarts from the slot's stored state); HF's
chunked "naive SSD" prefill is the same recurrence in f32, so greedy
output is token-identical.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.model_exec.forward_batch import ForwardBatch


class Mamba2Dims:
    """Mixer dims consumed by mamba2_mixer. `prefix_map` lets hybrid
    configs alias their field names (mamba_n_heads etc.)."""

    def __init__(self, hf, prefix: str = ""):
        g = lambda k, d=None: getattr(hf, prefix + k, None) \
            if getattr(hf, prefix + k, None) is not None else d
        hidden = hf.hidden_size
        self.d_inner = int(
            g("intermediate_size") or g("expand", 2) * hidden
        )
        self.d_state = int(g("state_size") or g("d_state", 128))
        self.d_conv = int(g("conv_kernel") or g("d_conv", 4))
        self.n_heads = int(g("num_heads") or g("n_heads", 8))
        self.head_dim = int(g("head_dim") or self.d_inner // self.n_heads)
        self.n_groups = int(g("n_groups", 1))
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.conv_bias = bool(g("use_conv_bias", True))
        self.proj_bias = bool(g("use_bias", False))
        lim = g("time_step_limit") or (0.0, float("inf"))
        self.dt_min, self.dt_max = float(lim[0]), float(lim[1])
        self.norm_eps = float(g("layer_norm_epsilon")
                              or getattr(hf, "rms_norm_eps", 1e-5))


def mamba2_specs(m: Mamba2Dims, p: str, H: int, dt,
                 gated_rmsnorm: bool = True) -> SpecTree:
    I, N, K, nh = m.d_inner, m.d_state, m.d_conv, m.n_heads
    proj_out = 2 * I + 2 * m.n_groups * N + nh
    s = {
        join(p, "in_proj/weight"): ParamSpec((H, proj_out), dt),
        join(p, "conv/weight"): ParamSpec((K, m.conv_dim), dt),
        join(p, "dt_bias"): ParamSpec((nh,), jnp.float32),
        join(p, "A_log"): ParamSpec((nh,), jnp.float32),
        join(p, "D"): ParamSpec((nh,), jnp.float32),
        join(p, "out_proj/weight"): ParamSpec((I, H), dt),
    }
    if gated_rmsnorm:
        s[join(p, "gated_norm/weight")] = ParamSpec((I,), dt)
    if m.conv_bias:
        s[join(p, "conv/bias")] = ParamSpec((m.conv_dim,), dt)
    if m.proj_bias:
        s[join(p, "in_proj/bias")] = ParamSpec((proj_out,), dt)
        s[join(p, "out_proj/bias")] = ParamSpec((H,), dt)
    return s


def mamba2_mixer(m: Mamba2Dims, params, p, x, conv_st, ssm_st,
                 fb: ForwardBatch, norm_before_gate: bool = False,
                 grouped_norm: bool = False, x_mult: float = 1.0,
                 mup=None, gated_rmsnorm: bool = True):
    """One mamba-2 block over the ragged token stream. x [T, H].

    x_mult/mup/gated_rmsnorm/norm_before_gate cover the FalconH1 mup
    variants (ssm_in_multiplier, compute_mup_vector, mamba_rms_norm)."""
    T = x.shape[0]
    I, N, K, nh, hd, G = (m.d_inner, m.d_state, m.d_conv, m.n_heads,
                          m.head_dim, m.n_groups)
    if x_mult != 1.0:
        x = x * jnp.asarray(x_mult, x.dtype)
    proj = jnp.dot(x, params[join(p, "in_proj/weight")])
    if m.proj_bias:
        proj = proj + params[join(p, "in_proj/bias")]
    if mup is not None:
        proj = proj * mup.astype(proj.dtype)
    gate = proj[:, :I]
    xBC = proj[:, I:I + m.conv_dim]
    dt_raw = proj[:, I + m.conv_dim:]  # [T, nh]

    # ---- seeded causal depthwise conv over each segment (mamba1 scheme)
    sid = fb.seq_ids
    offs = jnp.arange(T, dtype=jnp.int32) - fb.cu_q_lens[sid]
    bslots = (fb.state_slots if fb.state_slots is not None
              else fb.req_slots)
    slot = bslots[sid]
    conv_w = params[join(p, "conv/weight")].astype(jnp.float32)  # [K, CD]
    acc = xBC.astype(jnp.float32) * conv_w[K - 1][None, :]
    st_f = conv_st.astype(jnp.float32)
    fresh_req = (fb.prefix_lens[sid] == 0)
    for d in range(1, K):
        from_stream = jnp.roll(xBC, d, axis=0).astype(jnp.float32)
        ent_idx = jnp.clip(K - 1 - d + offs, 0, K - 2)
        from_state = jnp.where(
            fresh_req[:, None], 0.0, st_f[slot, ent_idx]
        )
        v = jnp.where((offs >= d)[:, None], from_stream, from_state)
        acc = acc + v * conv_w[K - 1 - d][None, :]
    if m.conv_bias:
        acc = acc + params[join(p, "conv/bias")].astype(jnp.float32)
    xBC_c = jax.nn.silu(acc)  # [T, CD] f32

    xs = xBC_c[:, :I].reshape(T, nh, hd)
    B = xBC_c[:, I:I + G * N].reshape(T, G, N)
    C = xBC_c[:, I + G * N:].reshape(T, G, N)
    rep = nh // G
    Bh = jnp.repeat(B, rep, axis=1)  # [T, nh, N]
    Ch = jnp.repeat(C, rep, axis=1)

    dt = jax.nn.softplus(
        dt_raw.astype(jnp.float32) + params[join(p, "dt_bias")][None, :]
    )
    dt = jnp.clip(dt, m.dt_min, m.dt_max)  # [T, nh]
    A = -jnp.exp(params[join(p, "A_log")])  # [nh]
    dA = jnp.exp(dt * A[None, :])  # [T, nh]
    # dBx[t] = dt * B ⊗ x : [T, nh, hd, N]
    dBx = (dt[:, :, None, None] * xs[:, :, :, None]
           * Bh[:, :, None, :])

    init = jnp.where(
        fresh_req[:, None, None, None], 0.0,
        ssm_st.astype(jnp.float32)[slot]
    )  # [T, nh, hd, N]
    fresh = (offs == 0)[:, None, None, None]

    def step(h_prev, inp):
        dA_t, dBx_t, fr, h_init = inp
        h_in = jnp.where(fr, h_init, h_prev)
        h = dA_t[:, None, None] * h_in + dBx_t
        return h, h

    _, hs = jax.lax.scan(
        step, jnp.zeros((nh, hd, N), jnp.float32),
        (dA, dBx, fresh, init),
    )  # [T, nh, hd, N]
    y = jnp.einsum("thdn,thn->thd", hs, Ch)
    y = y + params[join(p, "D")][None, :, None] * xs  # D skip
    y = y.reshape(T, I)

    # gated RMSNorm (HF MambaRMSNormGated): norm(y * silu(gate)) * w;
    # norm_before_gate (FalconH1 flavor) norms y first, then gates.
    gf = jax.nn.silu(gate.astype(jnp.float32))
    if not gated_rmsnorm:  # FalconH1 mamba_rms_norm=False: gate only
        y = y * gf
        out = jnp.dot(y.astype(x.dtype),
                      params[join(p, "out_proj/weight")])
        if m.proj_bias:
            out = out + params[join(p, "out_proj/bias")]
        return _mamba2_writeback(m, fb, out, conv_st, ssm_st, hs, xBC)
    w = params[join(p, "gated_norm/weight")].astype(jnp.float32)

    def _rms(v):
        if grouped_norm and G > 1:
            # group-wise variance (FalconH1-style grouped RMSNormGated;
            # HF Mamba2's MambaRMSNormGated is full-width even for G>1)
            vg = v.reshape(T, G, I // G)
            var = jnp.mean(jnp.square(vg), axis=-1, keepdims=True)
            return (vg * jax.lax.rsqrt(var + m.norm_eps)).reshape(T, I)
        var = jnp.mean(jnp.square(v), axis=-1, keepdims=True)
        return v * jax.lax.rsqrt(var + m.norm_eps)

    if norm_before_gate:
        y = _rms(y) * w * gf
    else:
        y = _rms(y * gf) * w
    out = jnp.dot(y.astype(x.dtype), params[join(p, "out_proj/weight")])
    if m.proj_bias:
        out = out + params[join(p, "out_proj/bias")]
    return _mamba2_writeback(m, fb, out, conv_st, ssm_st, hs, xBC)


def _mamba2_writeback(m: Mamba2Dims, fb: ForwardBatch, out, conv_st,
                      ssm_st, hs, xBC):
    """Write back final per-request states (mamba1 scheme, conv_dim
    channels); returns (out, new_conv, new_ssm)."""
    T = xBC.shape[0]
    K = m.d_conv
    bslots = (fb.state_slots if fb.state_slots is not None
              else fb.req_slots)
    last_rows = fb.cu_q_lens[:-1] + jnp.maximum(fb.q_lens - 1, 0)
    new_ssm = ssm_st.at[bslots].set(hs[last_rows].astype(ssm_st.dtype))
    st_old = conv_st[bslots]
    fresh_b = (fb.prefix_lens == 0)
    ents = []
    for j in range(K - 1):
        back = K - 2 - j
        idx = last_rows - back
        from_stream = xBC[jnp.clip(idx, 0, T - 1)].astype(conv_st.dtype)
        in_seg = (fb.q_lens - 1 - back) >= 0
        old_j = jnp.clip(j + fb.q_lens, 0, K - 2)
        from_old = jnp.where(
            fresh_b[:, None],
            jnp.zeros_like(from_stream),
            jnp.take_along_axis(
                st_old, old_j[:, None, None].repeat(st_old.shape[2], 2),
                axis=1,
            )[:, 0, :],
        )
        ents.append(jnp.where(in_seg[:, None], from_stream, from_old))
    new_conv = conv_st.at[bslots].set(
        jnp.stack(ents, axis=1).astype(conv_st.dtype)
    )
    return out, new_conv, new_ssm


class Mamba2ForCausalLM:
    """Pure Mamba-2 (codestral-mamba class). Ref srt/models/mamba2.py +
    HF Mamba2ForCausalLM."""

    is_multimodal = False
    no_prefix_cache = True
    is_recurrent = True

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.m = Mamba2Dims(hf)
        self.n_layers = config.num_hidden_layers
        self.eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        # Unlike mamba1, HF Mamba2Config defaults tie_word_embeddings=False
        self.tied = bool(getattr(hf, "tie_word_embeddings", False))

    def state_shapes(self, num_slots: int):
        m = self.m
        return [
            (
                (num_slots + 1, m.d_conv - 1, m.conv_dim),
                (num_slots + 1, m.n_heads, m.head_dim, m.d_state),
            )
            for _ in range(self.n_layers)
        ]

    def param_specs(self) -> SpecTree:
        c = self.config
        dt = c.dtype
        s = {
            "embed/weight": ParamSpec((c.vocab_size, c.hidden_size), dt),
            "final_norm/weight": ParamSpec((c.hidden_size,), dt),
        }
        if not self.tied:
            s["lm_head/weight"] = ParamSpec(
                (c.hidden_size, c.vocab_size), dt
            )
        for i in range(self.n_layers):
            p = f"layers/{i}"
            s[join(p, "norm/weight")] = ParamSpec((c.hidden_size,), dt)
            s.update(mamba2_specs(self.m, p, c.hidden_size, dt))
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
        x = params["embed/weight"][fb.input_ids]
        new_kv = []
        for i in range(self.n_layers):
            p = f"layers/{i}"
            conv_st, ssm_st = kv[i]
            h = self._rms(params, join(p, "norm/weight"), x, self.eps)
            out, conv_st, ssm_st = mamba2_mixer(
                self.m, params, p, h, conv_st, ssm_st, fb
            )
            x = x + out
            new_kv.append((conv_st, ssm_st))
        x = self._rms(params, "final_norm/weight", x, self.eps)
        return x, tuple(new_kv)

    def compute_logits(self, params, hidden):
        if self.tied:
            return jnp.dot(hidden, params["embed/weight"].T)
        return jnp.dot(hidden, params["lm_head/weight"])

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name == "lm_head.weight":
            if self.tied:
                return []
            return [("lm_head/weight", None, arr.T)]
        return map_mamba2_block(self.config, name, arr)


def map_mamba2_block(config, name: str, arr: np.ndarray,
                     hf_block: str = "backbone.layers.{i}.mixer.",
                     our_block: str = "layers/{i}"):
    """HF mamba2 tensor names -> our param tree (shared by hybrids)."""
    if name == "backbone.embeddings.weight":
        return [("embed/weight", None, arr)]
    if name == "backbone.norm_f.weight":
        return [("final_norm/weight", None, arr)]
    if name.startswith("backbone.layers."):
        rest = name[len("backbone.layers."):]
        idx, sub = rest.split(".", 1)
        p = f"layers/{idx}"
        if sub == "norm.weight":
            return [(f"{p}/norm/weight", None, arr)]
        if sub.startswith("mixer."):
            return map_mamba2_mixer_weight(p, sub[len("mixer."):], arr)
    return []


def map_mamba2_mixer_weight(p: str, sub: str, arr: np.ndarray):
    m = {
        "in_proj.weight": (f"{p}/in_proj/weight", None, "t"),
        "in_proj.bias": (f"{p}/in_proj/bias", None, ""),
        "conv1d.weight": (f"{p}/conv/weight", None, "conv"),
        "conv1d.bias": (f"{p}/conv/bias", None, ""),
        "dt_bias": (f"{p}/dt_bias", None, ""),
        "A_log": (f"{p}/A_log", None, ""),
        "D": (f"{p}/D", None, ""),
        "norm.weight": (f"{p}/gated_norm/weight", None, ""),
        "out_proj.weight": (f"{p}/out_proj/weight", None, "t"),
        "out_proj.bias": (f"{p}/out_proj/bias", None, ""),
    }
    if sub not in m:
        return []
    pname, slot, tf = m[sub]
    if tf == "t":
        arr = arr.T
    elif tf == "conv":
        # HF conv1d weight [CD, 1, K] -> ours [K, CD]
        arr = arr[:, 0, :].T
    return [(pname, slot, arr)]
