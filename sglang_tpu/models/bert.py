"""BERT-family encoder (embedding models: bert-base, Contriever, GTE).

Behavioral reference: srt/models/bert.py + HF BertModel numerics.
Encoder-only: bidirectional self-attention computed DENSELY over the
ragged extend stream (mask = same-sequence pairs) — no KV cache, no
causal machinery; the paged pool passes through untouched. Serves the
encode path (/v1/embeddings, /v1/rerank) with CLS or mean pooling.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.model_exec.forward_batch import ForwardBatch

NEG_INF = -1e30


class BertModel:
    is_multimodal = False
    pooling = "cls"  # ref srt/models/bert.py CLS pooling

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        self.layer_norm_eps = getattr(hf, "layer_norm_eps", 1e-12)
        self.type_vocab = getattr(hf, "type_vocab_size", 2)
        self.nh = config.num_attention_heads
        self.hd = config.hidden_size // self.nh
        self.act = {
            "gelu": lambda x: jax.nn.gelu(x, approximate=False),
            "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
            "relu": jax.nn.relu,
        }[getattr(hf, "hidden_act", "gelu")]

    # ------------------------------------------------------------- specs
    def param_specs(self) -> SpecTree:
        c = self.config
        dt = c.dtype
        H, I, V = c.hidden_size, c.intermediate_size, c.vocab_size
        s = {
            "embed/word": ParamSpec((V, H), dt),
            "embed/position": ParamSpec((c.context_length, H), dt),
            "embed/token_type": ParamSpec((self.type_vocab, H), dt),
            "embed/ln_w": ParamSpec((H,), dt),
            "embed/ln_b": ParamSpec((H,), dt),
        }
        for i in range(c.num_hidden_layers):
            p = f"layers/{i}"
            for n, shape in (
                ("q_w", (H, H)), ("q_b", (H,)),
                ("k_w", (H, H)), ("k_b", (H,)),
                ("v_w", (H, H)), ("v_b", (H,)),
                ("o_w", (H, H)), ("o_b", (H,)),
                ("attn_ln_w", (H,)), ("attn_ln_b", (H,)),
                ("fc1_w", (H, I)), ("fc1_b", (I,)),
                ("fc2_w", (I, H)), ("fc2_b", (H,)),
                ("out_ln_w", (H,)), ("out_ln_b", (H,)),
            ):
                s[join(p, n)] = ParamSpec(shape, dt)
        return s

    # ----------------------------------------------------------- helpers
    def _ln(self, params, w, b, x):
        m = jnp.mean(x, axis=-1, keepdims=True)
        v = jnp.var(x, axis=-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + self.layer_norm_eps) * params[
            w
        ] + params[b]

    # ----------------------------------------------------------- forward
    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
                 aux=None):
        c = self.config
        T = fb.input_ids.shape[0]
        x = params["embed/word"][fb.input_ids]
        x = x + params["embed/position"][fb.positions]
        x = x + params["embed/token_type"][0][None, :]
        x = self._ln(params, "embed/ln_w", "embed/ln_b", x)

        # Bidirectional same-sequence mask over the ragged stream; rows
        # past a segment's q_len (alignment padding) are excluded.
        sid = fb.seq_ids  # [T]
        offs = jnp.arange(T, dtype=jnp.int32) - fb.cu_q_lens[sid]
        # alignment-padding rows carry the LAST segment's seq id with
        # negative offsets — both bounds matter.
        valid = (offs >= 0) & (offs < fb.q_lens[sid])
        mask = (sid[:, None] == sid[None, :]) & valid[:, None] & valid[None, :]

        nh, hd = self.nh, self.hd
        for i in range(c.num_hidden_layers):
            p = f"layers/{i}"
            q = jnp.dot(x, params[join(p, "q_w")]) + params[join(p, "q_b")]
            k = jnp.dot(x, params[join(p, "k_w")]) + params[join(p, "k_b")]
            v = jnp.dot(x, params[join(p, "v_w")]) + params[join(p, "v_b")]
            q = q.reshape(T, nh, hd)
            k = k.reshape(T, nh, hd)
            v = v.reshape(T, nh, hd)
            scores = jnp.einsum(
                "thd,shd->hts", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            scores = jnp.where(mask[None, :, :], scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            o = jnp.einsum("hts,shd->thd", probs, v).reshape(T, -1)
            o = jnp.dot(o, params[join(p, "o_w")]) + params[join(p, "o_b")]
            x = self._ln(params, join(p, "attn_ln_w"), join(p, "attn_ln_b"),
                         x + o)
            h = self.act(
                jnp.dot(x, params[join(p, "fc1_w")]) + params[join(p, "fc1_b")]
            )
            h = jnp.dot(h, params[join(p, "fc2_w")]) + params[join(p, "fc2_b")]
            x = self._ln(params, join(p, "out_ln_w"), join(p, "out_ln_b"),
                         x + h)
        return x, kv

    def compute_logits(self, params, hidden):
        raise ValueError(
            "BertModel is an embedding model; use /v1/embeddings (encode), "
            "not generation"
        )

    # ------------------------------------------------------ weight names
    def map_hf_weight(self, name: str, arr: np.ndarray):
        for pre in ("bert.", "model.", ""):
            if name.startswith(pre + "embeddings."):
                rest = name[len(pre) + len("embeddings."):]
                m = {
                    "word_embeddings.weight": ("embed/word", False),
                    "position_embeddings.weight": ("embed/position", False),
                    "token_type_embeddings.weight": ("embed/token_type",
                                                     False),
                    "LayerNorm.weight": ("embed/ln_w", False),
                    "LayerNorm.bias": ("embed/ln_b", False),
                }
                if rest in m:
                    ours, _ = m[rest]
                    return [(ours, None, arr)]
                return []
            if name.startswith(pre + "encoder.layer."):
                rest = name[len(pre) + len("encoder.layer."):]
                idx, sub = rest.split(".", 1)
                p = f"layers/{idx}"
                m = {
                    "attention.self.query.weight": ("q_w", True),
                    "attention.self.query.bias": ("q_b", False),
                    "attention.self.key.weight": ("k_w", True),
                    "attention.self.key.bias": ("k_b", False),
                    "attention.self.value.weight": ("v_w", True),
                    "attention.self.value.bias": ("v_b", False),
                    "attention.output.dense.weight": ("o_w", True),
                    "attention.output.dense.bias": ("o_b", False),
                    "attention.output.LayerNorm.weight": ("attn_ln_w", False),
                    "attention.output.LayerNorm.bias": ("attn_ln_b", False),
                    "intermediate.dense.weight": ("fc1_w", True),
                    "intermediate.dense.bias": ("fc1_b", False),
                    "output.dense.weight": ("fc2_w", True),
                    "output.dense.bias": ("fc2_b", False),
                    "output.LayerNorm.weight": ("out_ln_w", False),
                    "output.LayerNorm.bias": ("out_ln_b", False),
                }
                if sub in m:
                    ours, transpose = m[sub]
                    return [(join(p, ours), None, arr.T if transpose else arr)]
                return []
        return []
