"""Nemotron decoder (NVIDIA). Behavioral reference: HF modeling_nemotron
(srt/models/nemotron* lineage). vs Llama: LayerNorm1P norms
((1 + w) * x_norm + b), un-gated relu^2 MLP, partial neox rope
(partial_rotary_factor), norm eps under config.norm_eps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.arcee import UpOnlyMLP
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


class NemotronAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        factor = float(
            getattr(c.hf_config, "partial_rotary_factor", 0.5) or 0.5
        )
        self.rotary = RotaryEmbedding(
            self.hd, int(self.hd * factor), c.context_length, c.rope_theta,
            c.rope_scaling,
        )


class NemotronDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        eps = float(getattr(c.hf_config, "norm_eps", 1e-5) or 1e-5)
        self.attn = NemotronAttention(c, layer_id)
        self.mlp = UpOnlyMLP(c, layer_id)
        self.input_norm = LayerNorm(c.hidden_size, eps, c.dtype,
                                    plus_one=True)
        self.post_norm = LayerNorm(c.hidden_size, eps, c.dtype,
                                   plus_one=True)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.input_norm.specs(join(p, "input_norm")))
        s.update(self.post_norm.specs(join(p, "post_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = self.input_norm(params, join(p, "input_norm"), x)
        h, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = x + h
        h = self.post_norm(params, join(p, "post_norm"), x)
        h = self.mlp(params, join(p, "mlp"), h)
        return x + h, None, kv


class NemotronForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        eps = float(getattr(c.hf_config, "norm_eps", 1e-5) or 1e-5)
        self.decoder_layers = [
            NemotronDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = LayerNorm(c.hidden_size, eps, c.dtype,
                                    plus_one=True)

    def __call__(self, params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        x = self.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if ".mlp.up_proj.weight" in name:
            idx = name.split(".layers.")[1].split(".", 1)[0]
            return [(f"layers/{idx}/mlp/up/weight", None, arr.T)]
        if ".mlp.down_proj.weight" in name:
            idx = name.split(".layers.")[1].split(".", 1)[0]
            return [(f"layers/{idx}/mlp/down/weight", None, arr.T)]
        if name == "model.norm.bias":
            return [("final_norm/bias", None, arr)]
        for hf, ours in (
            ("input_layernorm", "input_norm"),
            ("post_attention_layernorm", "post_norm"),
        ):
            for field in ("weight", "bias"):
                if f".{hf}.{field}" in name:
                    idx = name.split(".layers.")[1].split(".", 1)[0]
                    return [(f"layers/{idx}/{ours}/{field}", None, arr)]
        return super().map_hf_weight(name, arr)
