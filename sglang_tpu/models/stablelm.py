"""StableLM (1.6b/zephyr-3b class) decoder. Ref: srt/models/stablelm.py.

vs Llama: full LayerNorm (with bias), PARTIAL rotary embeddings (rope on
the first head_dim*partial_rotary_factor dims only), optional qkv bias.
qk_layernorm / parallel-residual variants are not wired yet. Tested
token-identical to HF.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import Params, SpecTree, join
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import (
    LlamaAttention,
    LlamaForCausalLM,
    LlamaMLP,
)


class StableLmAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        use_bias = bool(getattr(c.hf_config, "use_qkv_bias", False))
        if use_bias != bool(c.attention_bias):
            from sglang_tpu.layers.linear import (
                ColumnParallelLinear,
                FusedColumnLinear,
            )

            self.q_proj = ColumnParallelLinear(
                c.hidden_size, self.nq * self.hd, c.dtype, use_bias
            )
            self.kv_proj = FusedColumnLinear(
                c.hidden_size, 2, self.nk * self.hd, c.dtype, use_bias
            )
        rotary_ndims = int(
            self.hd * getattr(c.hf_config, "partial_rotary_factor", 1.0)
        )
        self.rotary = RotaryEmbedding(
            self.hd, rotary_ndims, c.context_length, c.rope_theta,
            c.rope_scaling,
        )


class StableLmDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        eps = getattr(c.hf_config, "layer_norm_eps", None) or c.rms_norm_eps
        self.attn = StableLmAttention(c, layer_id)
        self.mlp = LlamaMLP(c, layer_id)
        self.input_norm = LayerNorm(c.hidden_size, eps, c.dtype)
        self.post_norm = LayerNorm(c.hidden_size, eps, c.dtype)

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
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = x + a
        h = self.post_norm(params, join(p, "post_norm"), x)
        x = x + self.mlp(params, join(p, "mlp"), h)
        return x, None, kv


class StableLmForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        eps = getattr(c.hf_config, "layer_norm_eps", None) or c.rms_norm_eps
        self.decoder_layers = [
            StableLmDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = LayerNorm(c.hidden_size, eps, c.dtype)

    def __call__(self, params: Params, fb: ForwardBatch, kv, attn_backend,
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

    def map_hf_weight(self, name: str, arr):
        if name == "model.norm.bias":
            return [("final_norm/bias", None, arr)]
        if name.startswith("model.layers.") and name.endswith(
            ("input_layernorm.bias", "post_attention_layernorm.bias")
        ):
            idx = name.split("layers.")[1].split(".")[0]
            which = (
                "input_norm" if "input_layernorm" in name else "post_norm"
            )
            return [(f"layers/{idx}/{which}/bias", None, arr)]
        return super().map_hf_weight(name, arr)
