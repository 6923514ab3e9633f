"""Whisper-style audio encoder tower (Qwen2-Audio's audio_tower).

Behavioral ref: srt/models/qwen2_audio.py (which wraps HF
Qwen2AudioEncoder) — reimplemented functionally in JAX for TPU: the
whole encoder is one jittable program (conv -> MXU matmuls, full
bidirectional attention with the padding-frame key mask HF builds in
Qwen2AudioForConditionalGeneration.forward, avg-pool, final LN).
Numerics match HF float32 (parity-tested)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec as P

from sglang_tpu.layers.base import ParamSpec, SpecTree, join


class WhisperEncoderTower:
    """pool/proj=True is the Qwen2-Audio tower (avg-pool + multi-modal
    projector); pool/proj=False is the bare Whisper encoder
    (ref srt/models/whisper.py WhisperEncoder:264)."""

    def __init__(self, audio_config, lm_hidden: int, dtype,
                 pool: bool = True, proj: bool = True):
        a = audio_config
        self.n_mels = a.num_mel_bins
        self.d = a.d_model
        self.nh = a.encoder_attention_heads
        self.hd = self.d // self.nh
        self.n_layers = a.encoder_layers
        self.max_pos = a.max_source_positions  # 1500
        self.ffn = a.encoder_ffn_dim
        self.lm_hidden = lm_hidden
        self.dtype = dtype
        self.scale = self.hd**-0.5
        self.pool = pool
        self.proj = proj

    # ---------------------------------------------------------------- specs
    def specs(self, p: str) -> SpecTree:
        dt = self.dtype
        s = {
            join(p, "conv1/weight"): ParamSpec((self.d, self.n_mels, 3), dt, P()),
            join(p, "conv1/bias"): ParamSpec((self.d,), dt, P()),
            join(p, "conv2/weight"): ParamSpec((self.d, self.d, 3), dt, P()),
            join(p, "conv2/bias"): ParamSpec((self.d,), dt, P()),
            join(p, "pos/weight"): ParamSpec((self.max_pos, self.d), dt, P()),
            join(p, "ln_post/weight"): ParamSpec((self.d,), dt, P()),
            join(p, "ln_post/bias"): ParamSpec((self.d,), dt, P()),
        }
        if self.proj:
            s[join(p, "proj/weight")] = ParamSpec(
                (self.d, self.lm_hidden), dt, P())
            s[join(p, "proj/bias")] = ParamSpec((self.lm_hidden,), dt, P())
        for i in range(self.n_layers):
            lp = join(p, f"layers/{i}")
            for nm, shape, bias in (
                ("q", (self.d, self.d), True),
                ("k", (self.d, self.d), False),
                ("v", (self.d, self.d), True),
                ("out", (self.d, self.d), True),
                ("fc1", (self.d, self.ffn), True),
                ("fc2", (self.ffn, self.d), True),
            ):
                s[join(lp, f"{nm}/weight")] = ParamSpec(shape, dt, P())
                if bias:
                    s[join(lp, f"{nm}/bias")] = ParamSpec((shape[1],), dt, P())
            for ln in ("ln1", "ln2"):
                s[join(lp, f"{ln}/weight")] = ParamSpec((self.d,), dt, P())
                s[join(lp, f"{ln}/bias")] = ParamSpec((self.d,), dt, P())
        return s

    # ----------------------------------------------------------------- call
    def _ln(self, params, p, x):
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        return (
            xf * params[join(p, "weight")].astype(jnp.float32)
            + params[join(p, "bias")].astype(jnp.float32)
        ).astype(x.dtype)

    def _linear(self, params, p, x, bias=True):
        y = jnp.dot(x, params[join(p, "weight")],
                    preferred_element_type=x.dtype)
        if bias:
            y = y + params[join(p, "bias")]
        return y

    def __call__(self, params, p, feats: jax.Array, feat_len: jax.Array):
        """feats [n_mels, 3000] -> (pooled [750, lm_hidden]); feat_len =
        real mel frames (padding frames masked out of attention keys,
        matching HF's audio_attention_mask)."""
        x = feats.astype(self.dtype)[None]  # [1, M, 3000]
        w1 = params[join(p, "conv1/weight")]
        x = jax.lax.conv_general_dilated(
            x, w1, window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NCW", "OIW", "NCW"),
        ) + params[join(p, "conv1/bias")][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        w2 = params[join(p, "conv2/weight")]
        x = jax.lax.conv_general_dilated(
            x, w2, window_strides=(2,), padding=[(1, 1)],
            dimension_numbers=("NCW", "OIW", "NCW"),
        ) + params[join(p, "conv2/bias")][None, :, None]
        x = jax.nn.gelu(x, approximate=False)
        h = x[0].T + params[join(p, "pos/weight")]  # [S=1500, d]

        S = h.shape[0]
        # post-conv length: (mel_len - 1) // 2 + 1 (HF
        # _get_feat_extract_output_lengths)
        post_conv = (feat_len - 1) // 2 + 1
        key_ok = jnp.arange(S, dtype=jnp.int32) < post_conv  # [S]

        for i in range(self.n_layers):
            lp = join(p, f"layers/{i}")
            res = h
            hn = self._ln(params, join(lp, "ln1"), h)
            q = self._linear(params, join(lp, "q"), hn) * self.scale
            k = self._linear(params, join(lp, "k"), hn, bias=False)
            v = self._linear(params, join(lp, "v"), hn)
            q = q.reshape(S, self.nh, self.hd)
            k = k.reshape(S, self.nh, self.hd)
            v = v.reshape(S, self.nh, self.hd)
            scores = jnp.einsum(
                "qhd,khd->hqk", q.astype(jnp.float32),
                k.astype(jnp.float32),
            )
            scores = jnp.where(key_ok[None, None, :], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum(
                "hqk,khd->qhd", probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(h.dtype).reshape(S, self.d)
            h = res + self._linear(params, join(lp, "out"), o)
            res = h
            hn = self._ln(params, join(lp, "ln2"), h)
            hn = jax.nn.gelu(
                self._linear(params, join(lp, "fc1"), hn), approximate=False
            )
            h = res + self._linear(params, join(lp, "fc2"), hn)

        if self.pool:
            # avg_pool1d(2, 2) over time, THEN final layer norm (HF order)
            h = (h[0::2] + h[1::2]) * 0.5  # [750, d]
        h = self._ln(params, join(p, "ln_post"), h)
        if self.proj:
            return self._linear(params, join(p, "proj"), h)  # [*, lm_hidden]
        return h  # [S, d] raw encoder states (Whisper enc-dec)

    # -------------------------------------------------------------- weights
    def map_hf_weight(self, name: str, arr: np.ndarray, prefix: str):
        flat = {
            "conv1.weight": ("conv1/weight", ""),
            "conv1.bias": ("conv1/bias", ""),
            "conv2.weight": ("conv2/weight", ""),
            "conv2.bias": ("conv2/bias", ""),
            "embed_positions.weight": ("pos/weight", ""),
            "layer_norm.weight": ("ln_post/weight", ""),
            "layer_norm.bias": ("ln_post/bias", ""),
        }
        if name in flat:
            tgt, tf = flat[name]
            return [(join(prefix, tgt), None, arr)]
        if name.startswith("layers."):
            parts = name.split(".")
            i = parts[1]
            sub = ".".join(parts[2:])
            lp = join(prefix, f"layers/{i}")
            m = {
                "self_attn.q_proj.weight": ("q/weight", "t"),
                "self_attn.q_proj.bias": ("q/bias", ""),
                "self_attn.k_proj.weight": ("k/weight", "t"),
                "self_attn.v_proj.weight": ("v/weight", "t"),
                "self_attn.v_proj.bias": ("v/bias", ""),
                "self_attn.out_proj.weight": ("out/weight", "t"),
                "self_attn.out_proj.bias": ("out/bias", ""),
                "self_attn_layer_norm.weight": ("ln1/weight", ""),
                "self_attn_layer_norm.bias": ("ln1/bias", ""),
                "fc1.weight": ("fc1/weight", "t"),
                "fc1.bias": ("fc1/bias", ""),
                "fc2.weight": ("fc2/weight", "t"),
                "fc2.bias": ("fc2/bias", ""),
                "final_layer_norm.weight": ("ln2/weight", ""),
                "final_layer_norm.bias": ("ln2/bias", ""),
            }
            if sub in m:
                tgt, tf = m[sub]
                if "t" in tf:
                    arr = arr.T
                return [(join(lp, tgt), None, arr)]
        return []
