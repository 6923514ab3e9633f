"""DeepSeek-V3 MTP / NextN speculative draft head.

Behavioral reference: srt/models/deepseek_nextn.py. The multi-token-
prediction module trained with DeepSeek-V3: token embedding and previous
target hidden are each RMS-normed, concatenated, projected back to H
(eh_proj), then passed through ONE full DeepseekV2 decoder layer (MLA +
MoE) and the shared head's norm. Plugged into the EagleWorker protocol —
same (token, prev-feature) conditioning as EAGLE, so the chain/tree
drafting and verify machinery apply unchanged; the draft KV is a 1-layer
MLA latent pool.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.layers.embedding import VocabEmbedding
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.deepseek_v2 import DeepseekV2DecoderLayer


class DeepseekNextN:
    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        hf = c.hf_config
        self.mla_dim = hf.kv_lora_rank + hf.qk_rope_head_dim
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.enorm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.hnorm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.layer = DeepseekV2DecoderLayer(c, layer_id=0)
        self.final_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def param_specs(self) -> SpecTree:
        c = self.config
        s = {}
        s.update(self.embed.specs("embed"))
        s.update(self.enorm.specs("enorm"))
        s.update(self.hnorm.specs("hnorm"))
        s["eh_proj/weight"] = ParamSpec(
            (2 * c.hidden_size, c.hidden_size), c.dtype
        )
        s.update(self.layer.specs("layers/0"))
        s.update(self.final_norm.specs("final_norm"))
        return s

    def __call__(
        self,
        params: Params,
        fb: ForwardBatch,
        kv,
        attn_backend,
        aux_hidden: jax.Array,  # [T, H] previous-position target features
    ) -> Tuple[jax.Array, jax.Array]:
        e = self.enorm(params, "enorm", self.embed(params, "embed",
                                                  fb.input_ids))
        h = self.hnorm(params, "hnorm", aux_hidden.astype(e.dtype))
        x = jnp.concatenate([e, h], axis=-1) @ params["eh_proj/weight"]
        x, residual, kv = self.layer(
            params, "layers/0", x, None, fb, kv, attn_backend
        )
        return self.final_norm(params, "final_norm", x + residual), kv

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name.startswith("model."):
            name = name[6:]
        # The nextn layer ships as model.layers.<N>.* for any N (exported
        # checkpoints renumber it 0; in-tree V3 checkpoints use
        # num_hidden_layers). Collapse to our layers/0.
        if name.startswith("layers."):
            rest = name.split(".", 2)[2]
            from sglang_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM

            mapped = DeepseekV2ForCausalLM.map_hf_weight(
                self, f"model.layers.0.{rest}", arr
            )
            if mapped:
                return mapped
        m = {
            "embed_tokens.weight": ("embed/weight", None),
            "enorm.weight": ("enorm/weight", None),
            "hnorm.weight": ("hnorm/weight", None),
            "eh_proj.weight": ("eh_proj/weight", "t"),
            "shared_head.norm.weight": ("final_norm/weight", None),
        }
        if name in m:
            ours, tf = m[name]
            return [(ours, None, arr.T if tf else arr)]
        return []
