"""EAGLE draft head: a one-layer feature-level autoregressive drafter.

Behavioral reference: srt/speculative/eagle_worker.py + srt/models/
llama_eagle.py. EAGLE predicts the TARGET model's hidden feature at the
next position from (token embedding, previous target feature):

    g_i = DecoderLayer( fc(concat(embed(t_i), f_{i-1})) )
    draft token t_{i+1} = argmax(target_lm_head(g_i))

so the draft shares the target's lm_head and vocabulary. The head has its
own (tiny, 1-layer) paged KV cache managed by EagleWorker. Matches the
EAGLE-1 checkpoint layout: embed_tokens, fc, layers.0.* with the first
layer's input_layernorm removed (fc output feeds attention directly).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.layers.embedding import VocabEmbedding
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaMLP


class EagleDraftModel:
    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.attn = LlamaAttention(c, layer_id=0)
        self.mlp = LlamaMLP(c, layer_id=0)
        self.post_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def param_specs(self) -> SpecTree:
        c = self.config
        s = {}
        s.update(self.embed.specs("embed"))
        s["fc/weight"] = ParamSpec((2 * c.hidden_size, c.hidden_size), c.dtype)
        s.update(self.attn.specs("layers/0/attn"))
        s.update(self.mlp.specs("layers/0/mlp"))
        s.update(self.post_norm.specs("layers/0/post_norm"))
        return s

    def __call__(
        self,
        params: Params,
        fb: ForwardBatch,
        kv,
        attn_backend,
        aux_hidden: jax.Array,  # [T, H] previous-position target features
    ) -> Tuple[jax.Array, jax.Array]:
        x = self.embed(params, "embed", fb.input_ids)
        x = jnp.concatenate([x, aux_hidden.astype(x.dtype)], axis=-1)
        x = x @ params["fc/weight"]
        # EAGLE-1: no input_layernorm on the (only) layer.
        residual = x
        a, kv = self.attn(params, "layers/0/attn", x, fb, kv, attn_backend)
        x, residual = self.post_norm(params, "layers/0/post_norm", a, residual)
        x = self.mlp(params, "layers/0/mlp", x)
        return x + residual, kv

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name.startswith("model."):
            name = name[6:]
        if name == "embed_tokens.weight":
            return [("embed/weight", None, arr)]
        if name == "fc.weight":
            return [("fc/weight", None, arr.T)]
        if name.startswith("layers.0."):
            sub = name[len("layers.0."):]
            p = "layers/0"
            m = {
                "self_attn.q_proj.weight": (f"{p}/attn/q_proj/weight", None, "t"),
                "self_attn.k_proj.weight": (f"{p}/attn/kv_proj/weight", 0, "t"),
                "self_attn.v_proj.weight": (f"{p}/attn/kv_proj/weight", 1, "t"),
                "self_attn.o_proj.weight": (f"{p}/attn/o_proj/weight", None, "t"),
                "mlp.gate_proj.weight": (f"{p}/mlp/gate_up/weight", 0, "t"),
                "mlp.up_proj.weight": (f"{p}/mlp/gate_up/weight", 1, "t"),
                "mlp.down_proj.weight": (f"{p}/mlp/down/weight", None, "t"),
                "post_attention_layernorm.weight": (f"{p}/post_norm/weight", None, ""),
            }
            if sub in m:
                pname, slot, tf = m[sub]
                if "t" in tf:
                    arr = arr.T
                return [(pname, slot, arr)]
        return []
