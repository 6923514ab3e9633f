"""Mamba (selective state space) causal LM with a recurrent STATE pool.

Behavioral reference: srt/layers/attention/mamba/ + HF MambaForCausalLM
numerics. TPU-native state handling: instead of paged KV, every layer
owns two SLOT-indexed state arrays in the "kv" pool tuple —

    conv_state [S+1, d_conv-1, d_inner]   (trailing conv inputs)
    ssm_state  [S+1, d_inner, d_state]    (selective-scan hidden state)

indexed by fb.req_slots (S = max_running_requests; the last slot is the
trash slot for padding rows). Extend chunks run a lax.scan from the
stored state and write the final state back, so chunked prefill and the
decode recurrence fall out of the same update; retraction simply replays
the prompt. Prefix caching is disabled (`no_prefix_cache`): recurrent
states are not page-addressable.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.model_exec.forward_batch import ForwardBatch


class MambaForCausalLM:
    is_multimodal = False
    no_prefix_cache = True  # recurrent state is not page-addressable
    is_recurrent = True

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.d_model = hf.hidden_size
        self.d_inner = int(getattr(hf, "intermediate_size",
                                   hf.expand * hf.hidden_size))
        self.d_state = hf.state_size
        self.d_conv = hf.conv_kernel
        self.dt_rank = hf.time_step_rank
        self.n_layers = config.num_hidden_layers
        self.eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.conv_bias = bool(getattr(hf, "use_conv_bias", True))
        self.proj_bias = bool(getattr(hf, "use_bias", False))

    # ---- state pool shapes consumed by ModelRunner/KVCachePool ----
    def state_shapes(self, num_slots: int) -> List[Tuple[Tuple[int, ...],
                                                         Tuple[int, ...]]]:
        """Per layer: (conv_state shape, ssm_state shape)."""
        return [
            (
                (num_slots + 1, self.d_conv - 1, self.d_inner),
                (num_slots + 1, self.d_inner, self.d_state),
            )
            for _ in range(self.n_layers)
        ]

    def param_specs(self) -> SpecTree:
        c = self.config
        dt = c.dtype
        H, I, S, R, K = (self.d_model, self.d_inner, self.d_state,
                         self.dt_rank, self.d_conv)
        s = {
            "embed/weight": ParamSpec((c.vocab_size, H), dt),
            "final_norm/weight": ParamSpec((H,), dt),
        }
        for i in range(self.n_layers):
            p = f"layers/{i}"
            s[join(p, "norm/weight")] = ParamSpec((H,), dt)
            s[join(p, "in_proj/weight")] = ParamSpec((H, 2 * I), dt)
            s[join(p, "conv/weight")] = ParamSpec((K, I), dt)
            if self.conv_bias:
                s[join(p, "conv/bias")] = ParamSpec((I,), dt)
            s[join(p, "x_proj/weight")] = ParamSpec((I, R + 2 * S), dt)
            s[join(p, "dt_proj/weight")] = ParamSpec((R, I), dt)
            s[join(p, "dt_proj/bias")] = ParamSpec((I,), dt)
            s[join(p, "A_log")] = ParamSpec((I, S), jnp.float32)
            s[join(p, "D")] = ParamSpec((I,), jnp.float32)
            s[join(p, "out_proj/weight")] = ParamSpec((I, H), dt)
            if self.proj_bias:
                s[join(p, "in_proj/bias")] = ParamSpec((2 * I,), dt)
                s[join(p, "out_proj/bias")] = ParamSpec((H,), dt)
        return s

    @staticmethod
    def _rms(params, key, x, eps):
        v = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                     keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(v + eps)).astype(
            x.dtype
        ) * params[key]

    def _mixer(self, params, p, x, conv_st, ssm_st, fb: ForwardBatch):
        return mamba1_mixer(self, params, p, x, conv_st, ssm_st, fb)



    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None):
        x = params["embed/weight"][fb.input_ids]
        new_kv = []
        for i in range(self.n_layers):
            p = f"layers/{i}"
            conv_st, ssm_st = kv[i]
            h = self._rms(params, join(p, "norm/weight"), x, self.eps)
            out, conv_st, ssm_st = self._mixer(params, p, h, conv_st,
                                               ssm_st, fb)
            x = x + out
            new_kv.append((conv_st, ssm_st))
        x = self._rms(params, "final_norm/weight", x, self.eps)
        return x, tuple(new_kv)

    def compute_logits(self, params, hidden):
        return jnp.dot(hidden, params["embed/weight"].T)  # tied

    # ---- HF weight mapping ----
    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name.startswith("backbone."):
            name = name[len("backbone."):]
        if name in ("embeddings.weight", "embedding.weight"):
            return [("embed/weight", None, arr)]
        if name == "norm_f.weight":
            return [("final_norm/weight", None, arr)]
        if name == "lm_head.weight":
            return []  # tied
        if not name.startswith("layers."):
            return []
        _, idx, rest = name.split(".", 2)
        p = f"layers/{idx}"
        m = {
            "norm.weight": ("norm/weight", None),
            "mixer.in_proj.weight": ("in_proj/weight", "t"),
            "mixer.in_proj.bias": ("in_proj/bias", None),
            "mixer.x_proj.weight": ("x_proj/weight", "t"),
            "mixer.dt_proj.weight": ("dt_proj/weight", "t"),
            "mixer.dt_proj.bias": ("dt_proj/bias", None),
            "mixer.A_log": ("A_log", None),
            "mixer.D": ("D", None),
            "mixer.out_proj.weight": ("out_proj/weight", "t"),
            "mixer.out_proj.bias": ("out_proj/bias", None),
            "mixer.conv1d.bias": ("conv/bias", None),
        }
        if rest in m:
            ours, tf = m[rest]
            return [(join(p, ours), None, arr.T if tf else arr)]
        if rest == "mixer.conv1d.weight":
            # HF depthwise conv [I, 1, K] -> ours [K, I]
            return [(join(p, "conv/weight"), None, arr[:, 0, :].T)]
        return []


def mamba1_mixer(m, params, p, x, conv_st, ssm_st, fb: ForwardBatch,
                 dtbc_norm_eps: float = 0.0):
    """One mamba-1 (selective scan) block over the ragged stream.

    `m` supplies dims/flags (d_inner, d_state, dt_rank, d_conv,
    conv_bias, proj_bias). x [T, H]; conv_st [S+1, K-1, I]; ssm_st
    [S+1, I, S]. Each sequence's segment scans from its slot's stored
    state; final states scatter back by slot. Segments are independent:
    the scan runs over the whole padded stream per sequence via a
    per-sequence gather (segments are contiguous and aligned).
    dtbc_norm_eps > 0 applies Jamba's dt/b/c RMS norms between the
    x_proj split and dt_proj (ref HF JambaMambaMixer.slow_forward)."""
    self = m
    T = x.shape[0]
    I, S, R, K = self.d_inner, self.d_state, self.dt_rank, self.d_conv
    xz = jnp.dot(x, params[join(p, "in_proj/weight")])
    if self.proj_bias:
        xz = xz + params[join(p, "in_proj/bias")]
    xi, z = xz[:, :I], xz[:, I:]

    # ---- causal depthwise conv over each segment, seeded from state
    sid = fb.seq_ids  # [T]
    offs = jnp.arange(T, dtype=jnp.int32) - fb.cu_q_lens[sid]
    bslots = (fb.state_slots if fb.state_slots is not None
              else fb.req_slots)  # [B]
    slot = bslots[sid]  # [T]
    # inputs at relative offsets -1..-K+1: from the stream when the
    # offset is inside this segment, else from the slot's conv state.
    conv_w = params[join(p, "conv/weight")].astype(jnp.float32)  # [K, I]
    acc = xi.astype(jnp.float32) * conv_w[K - 1][None, :]
    st_f = conv_st.astype(jnp.float32)
    # a segment with prefix 0 STARTS the request: its initial states
    # are zeros, not whatever the slot last held.
    fresh_req = (fb.prefix_lens[sid] == 0)  # [T]
    for d in range(1, K):
        from_stream = jnp.roll(xi, d, axis=0).astype(jnp.float32)
        # state is stored most-recent-last: for a token at segment
        # offset o, the input d tokens earlier is (d-o) tokens before
        # the segment, i.e. entry (K-1)-(d-o). Only rows with o<d
        # consume this branch, so clipping the o>=d rows is safe.
        ent_idx = jnp.clip(K - 1 - d + offs, 0, K - 2)  # [T]
        from_state = jnp.where(
            fresh_req[:, None], 0.0, st_f[slot, ent_idx]
        )  # [T, I]
        take_stream = offs >= d
        v = jnp.where(take_stream[:, None], from_stream, from_state)
        acc = acc + v * conv_w[K - 1 - d][None, :]
    if self.conv_bias:
        acc = acc + params[join(p, "conv/bias")].astype(jnp.float32)
    xc = jax.nn.silu(acc)  # [T, I] f32

    # ---- selective scan parameters
    xdbc = jnp.dot(xc.astype(x.dtype), params[join(p, "x_proj/weight")])
    dt_in, B, C = (xdbc[:, :R], xdbc[:, R:R + S], xdbc[:, R + S:])
    if dtbc_norm_eps:
        # Jamba: RMS-normalize the dt/B/C selection slices (ref HF
        # JambaMambaMixer dt_layernorm/b_layernorm/c_layernorm).
        def _n(v, key):
            vf = v.astype(jnp.float32)
            r = jax.lax.rsqrt(
                jnp.mean(jnp.square(vf), axis=-1, keepdims=True)
                + dtbc_norm_eps
            )
            return (vf * r * params[join(p, key)].astype(jnp.float32)
                    ).astype(v.dtype)
        dt_in = _n(dt_in, "dt_norm/weight")
        B = _n(B, "b_norm/weight")
        C = _n(C, "c_norm/weight")
    dt = jax.nn.softplus(
        jnp.dot(dt_in, params[join(p, "dt_proj/weight")]).astype(
            jnp.float32
        )
        + params[join(p, "dt_proj/bias")].astype(jnp.float32)
    )  # [T, I]
    A = -jnp.exp(params[join(p, "A_log")])  # [I, S] f32
    dA = jnp.exp(dt[:, :, None] * A[None])  # [T, I, S]
    dBx = (dt[:, :, None] * B.astype(jnp.float32)[:, None, :]
           * xc[:, :, None])  # [T, I, S]

    # ---- recurrence via scan over the padded stream; a token at
    # offset 0 loads its slot's stored ssm state (zeros when the
    # segment starts the request) instead of carrying the previous
    # (different-sequence) token's state.
    init = jnp.where(
        fresh_req[:, None, None], 0.0, ssm_st.astype(jnp.float32)[slot]
    )  # [T, I, S] (per-token load)

    def step(h_prev, inp):
        dA_t, dBx_t, fresh, h_init = inp
        h_in = jnp.where(fresh, h_init, h_prev)
        h = dA_t * h_in + dBx_t
        return h, h
    fresh = (offs == 0)[:, None, None]
    _, hs = jax.lax.scan(
        step,
        jnp.zeros((self.d_inner, S), jnp.float32),
        (dA, dBx, fresh, init),
    )  # [T, I, S]
    y = jnp.einsum("tis,ts->ti", hs, C.astype(jnp.float32))
    y = y + params[join(p, "D")][None, :] * xc
    y = y * jax.nn.silu(z.astype(jnp.float32))
    out = jnp.dot(y.astype(x.dtype), params[join(p, "out_proj/weight")])
    if self.proj_bias:
        out = out + params[join(p, "out_proj/bias")]

    # ---- write back final states per sequence (last row of each seg)
    last_rows = fb.cu_q_lens[:-1] + jnp.maximum(fb.q_lens - 1, 0)  # [B]
    bslot = bslots  # [B]
    new_ssm = ssm_st.at[bslot].set(
        hs[last_rows].astype(ssm_st.dtype)
    )
    # conv state: the last K-1 inputs of each segment. Entry j (j=0
    # oldest) holds the input `back = K-2-j` tokens before the last.
    # When `back >= q` the input predates this segment and comes from
    # the OLD state shifted by q (old entry j+q holds that position),
    # or zeros when the segment started the request.
    ent = []
    st_old = conv_st[bslot]  # [B, K-1, I]
    fresh_b = (fb.prefix_lens == 0)  # [B]
    for j in range(K - 1):
        back = K - 2 - j
        idx = last_rows - back
        from_stream = xi[jnp.clip(idx, 0, T - 1)].astype(conv_st.dtype)
        in_seg = (fb.q_lens - 1 - back) >= 0
        old_j = jnp.clip(j + fb.q_lens, 0, K - 2)  # [B]
        from_state = jnp.take_along_axis(
            st_old, old_j[:, None, None], axis=1
        )[:, 0]
        from_state = jnp.where(
            fresh_b[:, None], jnp.zeros_like(from_state), from_state
        )
        ent.append(
            jnp.where(in_seg[:, None], from_stream, from_state)
        )
    new_conv = conv_st.at[bslot].set(
        jnp.stack(ent, axis=1).astype(conv_st.dtype)
    )
    return out, new_conv, new_ssm
