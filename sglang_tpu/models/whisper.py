"""Whisper encoder-decoder ASR (WhisperForConditionalGeneration).

Ref behavior: srt/models/whisper.py. The reference rides cross-attention
on its paged KV pool by prepending dummy "encoder tokens" to every
request and giving encoder/self/cross attention disjoint RadixAttention
layer ids (ref whisper.py:204-229,427). TPU-native redesign: the audio
encoder runs ONCE per request as its own jitted program (like ViT
encodes), its per-decoder-layer cross K/V land in slot-indexed arrays
appended after the paged layers in the runner's kv tuple
(model_runner.py cross-KV tail), and decoder cross-attention gathers by
fb.state_slots — no fake tokens, no page allocation for the fixed-length
encoder context.

Whisper always pads audio to 30 s (3000 mel frames -> 1500 encoder
positions) and HF attends all of them in cross-attention (no encoder
attention mask), so no per-request cross mask is needed — parity is
byte-exact with HF greedy decode (tests/test_whisper.py).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.multimodal.audio_whisper import WhisperEncoderTower


class WhisperDecoderLayer:
    """Pre-LN: self-attn (paged) -> cross-attn (slot cross-KV) -> GELU MLP."""

    def __init__(self, d: int, nh: int, ffn: int, eps: float, dtype,
                 layer_id: int):
        self.d, self.nh, self.hd = d, nh, d // nh
        self.ffn = ffn
        self.dtype = dtype
        self.layer_id = layer_id
        self.ln_self = LayerNorm(d, eps, dtype)
        self.ln_cross = LayerNorm(d, eps, dtype)
        self.ln_mlp = LayerNorm(d, eps, dtype)

    def specs(self, p: str) -> SpecTree:
        dt = self.dtype
        d, ffn = self.d, self.ffn
        s = {}
        # HF bias pattern: q/v/out biased, k un-biased (both attentions).
        for group in ("self", "cross"):
            for nm, shape, bias in (
                ("q", (d, d), True),
                ("k", (d, d), False),
                ("v", (d, d), True),
                ("out", (d, d), True),
            ):
                s[join(p, f"{group}_{nm}/weight")] = ParamSpec(
                    shape, dt, P(None, None))
                if bias:
                    s[join(p, f"{group}_{nm}/bias")] = ParamSpec(
                        (shape[1],), dt, P())
        s[join(p, "fc1/weight")] = ParamSpec((d, ffn), dt, P(None, None))
        s[join(p, "fc1/bias")] = ParamSpec((ffn,), dt, P())
        s[join(p, "fc2/weight")] = ParamSpec((ffn, d), dt, P(None, None))
        s[join(p, "fc2/bias")] = ParamSpec((d,), dt, P())
        s.update(self.ln_self.specs(join(p, "ln_self")))
        s.update(self.ln_cross.specs(join(p, "ln_cross")))
        s.update(self.ln_mlp.specs(join(p, "ln_mlp")))
        return s

    def _lin(self, params, p, x, bias=True):
        y = jnp.dot(x, params[join(p, "weight")],
                    preferred_element_type=x.dtype)
        if bias:
            y = y + params[join(p, "bias")]
        return y

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 n_layers: int):
        T = x.shape[0]
        nh, hd = self.nh, self.hd
        # --- causal self-attention over the paged pool ---
        res = x
        h = self.ln_self(params, join(p, "ln_self"), x)
        q = self._lin(params, join(p, "self_q"), h).reshape(T, nh, hd)
        k = self._lin(params, join(p, "self_k"), h, bias=False).reshape(
            T, nh, hd)
        v = self._lin(params, join(p, "self_v"), h).reshape(T, nh, hd)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb)
        x = res + self._lin(params, join(p, "self_out"), out.reshape(T, -1))
        # --- cross-attention over the slot-indexed encoder K/V ---
        res = x
        h = self.ln_cross(params, join(p, "ln_cross"), x)
        q = self._lin(params, join(p, "cross_q"), h).reshape(T, nh, hd)
        ck, cv = kv[n_layers + self.layer_id]  # [R+1, S, nh, hd] each
        slots = fb.state_slots[fb.seq_ids]  # [T]
        ckt = ck[slots]  # [T, S, nh, hd]
        cvt = cv[slots]
        scores = jnp.einsum(
            "thd,tshd->ths", q, ckt, preferred_element_type=jnp.float32
        ) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(cvt.dtype)
        out = jnp.einsum(
            "ths,tshd->thd", probs, cvt, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        x = res + self._lin(params, join(p, "cross_out"),
                            out.reshape(T, -1))
        # --- MLP ---
        res = x
        h = self.ln_mlp(params, join(p, "ln_mlp"), x)
        h = jax.nn.gelu(self._lin(params, join(p, "fc1"), h),
                        approximate=False)
        x = res + self._lin(params, join(p, "fc2"), h)
        return x, kv


class WhisperForConditionalGeneration:
    """Decoder runs through the normal paged/scheduled path; the encoder
    and the cross-K/V projection run once per request (encode_cross)."""

    is_encoder_decoder = True

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.d = hf.d_model
        self.nh = hf.decoder_attention_heads
        self.hd = self.d // self.nh
        self.n_layers = hf.decoder_layers
        self.S = hf.max_source_positions  # encoder positions (1500)
        self.vocab = hf.vocab_size
        self.max_tgt = hf.max_target_positions
        self.dtype = config.dtype
        eps = 1e-5
        self.encoder = WhisperEncoderTower(
            hf, self.d, config.dtype, pool=False, proj=False
        )
        self.layers = [
            WhisperDecoderLayer(self.d, self.nh, hf.decoder_ffn_dim, eps,
                                config.dtype, i)
            for i in range(self.n_layers)
        ]
        self.ln_final = LayerNorm(self.d, eps, config.dtype)

    # ---- cross-KV tail contract (model_runner.py) ----
    def cross_kv_shapes(self, max_reqs: int) -> List[Tuple[tuple, object]]:
        """Per decoder layer, the (k, v) cross arrays appended after the
        paged layers in the kv tuple; slot-indexed (last row = trash)."""
        shape = (max_reqs + 1, self.S, self.nh, self.hd)
        return [(shape, self.dtype) for _ in range(self.n_layers)]

    def encode_cross(self, params, feats: jax.Array):
        """[n_mels, 3000] log-mel -> (ck, cv) [L, S, nh, hd]: encoder
        forward + each decoder layer's cross k/v projection."""
        # Whisper attends every encoder position (full 30 s pad) — pass
        # the full frame count so the tower's key mask admits all keys.
        enc = self.encoder(
            params, "encoder", feats,
            jnp.asarray(feats.shape[-1], jnp.int32),
        )  # [S, d]
        cks, cvs = [], []
        for i in range(self.n_layers):
            p = f"layers/{i}"
            k = jnp.dot(enc, params[join(p, "cross_k/weight")],
                        preferred_element_type=enc.dtype)
            v = jnp.dot(enc, params[join(p, "cross_v/weight")],
                        preferred_element_type=enc.dtype)
            v = v + params[join(p, "cross_v/bias")]
            cks.append(k.reshape(self.S, self.nh, self.hd))
            cvs.append(v.reshape(self.S, self.nh, self.hd))
        return jnp.stack(cks), jnp.stack(cvs)

    # ---- specs ----
    def param_specs(self) -> SpecTree:
        dt = self.dtype
        s = {
            "embed/weight": ParamSpec((self.vocab, self.d), dt,
                                      P(None, None)),
            "pos/weight": ParamSpec((self.max_tgt, self.d), dt, P()),
        }
        s.update(self.encoder.specs("encoder"))
        for i, layer in enumerate(self.layers):
            s.update(layer.specs(f"layers/{i}"))
        s.update(self.ln_final.specs("ln_final"))
        return s

    # ---- forward ----
    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None):
        x = params["embed/weight"][fb.input_ids]
        x = x + params["pos/weight"][fb.positions]
        for i, layer in enumerate(self.layers):
            x, kv = layer(params, f"layers/{i}", x, fb, kv, attn_backend,
                          self.n_layers)
        x = self.ln_final(params, "ln_final", x)
        return x, kv

    def compute_logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        w = params["embed/weight"]
        return jax.lax.dot_general(
            hidden, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- HF weight mapping ----
    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name.startswith("model."):
            name = name[6:]
        if name == "decoder.embed_tokens.weight" or name == "proj_out.weight":
            return [("embed/weight", None, arr)] \
                if name.startswith("decoder") else []
        if name == "decoder.embed_positions.weight":
            return [("pos/weight", None, arr)]
        if name == "decoder.layer_norm.weight":
            return [("ln_final/weight", None, arr)]
        if name == "decoder.layer_norm.bias":
            return [("ln_final/bias", None, arr)]
        if name.startswith("encoder."):
            return self.encoder.map_hf_weight(name[8:], arr, "encoder")
        if name.startswith("decoder.layers."):
            parts = name.split(".")
            i = parts[2]
            sub = ".".join(parts[3:])
            p = f"layers/{i}"
            m = {
                "self_attn.q_proj.weight": (f"{p}/self_q/weight", "t"),
                "self_attn.q_proj.bias": (f"{p}/self_q/bias", ""),
                "self_attn.k_proj.weight": (f"{p}/self_k/weight", "t"),
                "self_attn.v_proj.weight": (f"{p}/self_v/weight", "t"),
                "self_attn.v_proj.bias": (f"{p}/self_v/bias", ""),
                "self_attn.out_proj.weight": (f"{p}/self_out/weight", "t"),
                "self_attn.out_proj.bias": (f"{p}/self_out/bias", ""),
                "encoder_attn.q_proj.weight": (f"{p}/cross_q/weight", "t"),
                "encoder_attn.q_proj.bias": (f"{p}/cross_q/bias", ""),
                "encoder_attn.k_proj.weight": (f"{p}/cross_k/weight", "t"),
                "encoder_attn.v_proj.weight": (f"{p}/cross_v/weight", "t"),
                "encoder_attn.v_proj.bias": (f"{p}/cross_v/bias", ""),
                "encoder_attn.out_proj.weight": (f"{p}/cross_out/weight", "t"),
                "encoder_attn.out_proj.bias": (f"{p}/cross_out/bias", ""),
                "self_attn_layer_norm.weight": (f"{p}/ln_self/weight", ""),
                "self_attn_layer_norm.bias": (f"{p}/ln_self/bias", ""),
                "encoder_attn_layer_norm.weight": (f"{p}/ln_cross/weight", ""),
                "encoder_attn_layer_norm.bias": (f"{p}/ln_cross/bias", ""),
                "final_layer_norm.weight": (f"{p}/ln_mlp/weight", ""),
                "final_layer_norm.bias": (f"{p}/ln_mlp/bias", ""),
                "fc1.weight": (f"{p}/fc1/weight", "t"),
                "fc1.bias": (f"{p}/fc1/bias", ""),
                "fc2.weight": (f"{p}/fc2/weight", "t"),
                "fc2.bias": (f"{p}/fc2/bias", ""),
            }
            if sub in m:
                tgt, tf = m[sub]
                if "t" in tf:
                    arr = arr.T
                return [(tgt, None, arr)]
        return []
