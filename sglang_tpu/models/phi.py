"""Phi-1/1.5/2 decoder (Microsoft). Behavioral reference: HF modeling_phi
(srt/models/phi.py lineage). vs Llama: PARALLEL residual from one shared
LayerNorm (x + attn(ln(x)) + mlp(ln(x))), biases on every linear incl.
the LM head, partial neox rope, fc1/gelu_new/fc2 MLP, final LayerNorm.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import ACT_SINGLE
from sglang_tpu.layers.base import ParamSpec, SpecTree, join
from sglang_tpu.layers.linear import ColumnParallelLinear, RowParallelLinear
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


class PhiAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        config.attention_bias = True
        super().__init__(config, layer_id)
        c = config
        factor = float(
            getattr(c.hf_config, "partial_rotary_factor", 0.5) or 0.5
        )
        self.rotary = RotaryEmbedding(
            self.hd, int(self.hd * factor), c.context_length, c.rope_theta,
            c.rope_scaling,
        )
        # o_proj ("dense") carries a bias too.
        self.o_proj = RowParallelLinear(self.nq * self.hd, c.hidden_size,
                                        c.dtype, bias=True)


class PhiMLP:
    def __init__(self, config: ModelConfig, layer_id: int = 0):
        c = config
        self.fc1 = ColumnParallelLinear(c.hidden_size, c.intermediate_size,
                                        c.dtype, bias=True)
        self.fc2 = RowParallelLinear(c.intermediate_size, c.hidden_size,
                                     c.dtype, bias=True)
        self.act = ACT_SINGLE[c.hidden_act]

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.fc1.specs(join(p, "fc1")))
        s.update(self.fc2.specs(join(p, "fc2")))
        return s

    def __call__(self, params, p, x, lora=None):
        return self.fc2(params, join(p, "fc2"),
                        self.act(self.fc1(params, join(p, "fc1"), x)))


class PhiDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        eps = float(getattr(c.hf_config, "layer_norm_eps", 1e-5) or 1e-5)
        self.attn = PhiAttention(c, layer_id)
        self.mlp = PhiMLP(c, layer_id)
        self.input_norm = LayerNorm(c.hidden_size, eps, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.input_norm.specs(join(p, "input_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = self.input_norm(params, join(p, "input_norm"), x)
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        m = self.mlp(params, join(p, "mlp"), h)
        return x + a + m, None, kv


class PhiForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        eps = float(getattr(c.hf_config, "layer_norm_eps", 1e-5) or 1e-5)
        self.decoder_layers = [
            PhiDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = LayerNorm(c.hidden_size, eps, c.dtype)

    def param_specs(self) -> SpecTree:
        s = super().param_specs()
        s["lm_head/bias"] = ParamSpec(
            (self.config.vocab_size,), self.config.dtype, P(), init_scale=0.0
        )
        return s

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

    def compute_logits(self, params, hidden: jax.Array) -> jax.Array:
        return super().compute_logits(params, hidden) + params[
            "lm_head/bias"
        ].astype(jnp.float32)

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name == "model.final_layernorm.weight":
            return [("final_norm/weight", None, arr)]
        if name == "model.final_layernorm.bias":
            return [("final_norm/bias", None, arr)]
        if name == "lm_head.bias":
            return [("lm_head/bias", None, arr)]
        if ".self_attn.dense." in name:
            idx = name.split(".layers.")[1].split(".", 1)[0]
            field = name.rsplit(".", 1)[1]
            arr = arr.T if field == "weight" else arr
            return [(f"layers/{idx}/attn/o_proj/{field}", None, arr)]
        if ".input_layernorm.bias" in name:
            idx = name.split(".layers.")[1].split(".", 1)[0]
            return [(f"layers/{idx}/input_norm/bias", None, arr)]
        for hf, ours in (("mlp.fc1", "mlp/fc1"), ("mlp.fc2", "mlp/fc2")):
            if f".{hf}." in name:
                idx = name.split(".layers.")[1].split(".", 1)[0]
                field = name.rsplit(".", 1)[1]
                arr = arr.T if field == "weight" else arr
                return [(f"layers/{idx}/{ours}/{field}", None, arr)]
        return super().map_hf_weight(name, arr)
