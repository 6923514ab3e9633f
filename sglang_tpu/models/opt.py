"""OPT (Meta): learned positions (+2 offset), LayerNorm, ReLU MLP.

Behavioral reference: srt/models/opt.py + HF OPTForCausalLM. Quirks:
position embedding table is indexed at position+2 (the legacy fairseq
offset); OPT-350M keeps word_embed_proj_dim != hidden_size with
project_in/project_out and puts the final LayerNorm behind
do_layer_norm_before=False (post-norm layers, no final norm).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, SpecTree, join
from sglang_tpu.layers.linear import ColumnParallelLinear, RowParallelLinear
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


class OPTAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        bias = bool(getattr(config.hf_config, "enable_bias", True))
        config.attention_bias = bias
        super().__init__(config, layer_id)
        self.o_proj = RowParallelLinear(self.nq * self.hd,
                                        config.hidden_size, config.dtype,
                                        bias=bias)

    def apply_rotary(self, fb: ForwardBatch, q, k):
        return q, k  # learned absolute positions


class OPTMLP:
    def __init__(self, config: ModelConfig):
        c = config
        hf = c.hf_config
        bias = bool(getattr(hf, "enable_bias", True))
        inner = int(getattr(hf, "ffn_dim", 4 * c.hidden_size))
        self.act_name = getattr(hf, "activation_function", "relu")
        self.fc1 = ColumnParallelLinear(c.hidden_size, inner, c.dtype,
                                        bias=bias)
        self.fc2 = RowParallelLinear(inner, c.hidden_size, c.dtype,
                                     bias=bias)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.fc1.specs(join(p, "fc1")))
        s.update(self.fc2.specs(join(p, "fc2")))
        return s

    def __call__(self, params, p, x, lora=None):
        h = self.fc1(params, join(p, "fc1"), x)
        if self.act_name == "relu":
            h = jax.nn.relu(h)
        else:
            h = jax.nn.gelu(h.astype(jnp.float32)).astype(x.dtype)
        return self.fc2(params, join(p, "fc2"), h)


class OPTDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        self.pre_norm = bool(getattr(c.hf_config, "do_layer_norm_before",
                                     True))
        self.attn = OPTAttention(c, layer_id)
        self.mlp = OPTMLP(c)
        self.ln_attn = LayerNorm(c.hidden_size, 1e-5, c.dtype)
        self.ln_mlp = LayerNorm(c.hidden_size, 1e-5, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.ln_attn.specs(join(p, "ln_attn")))
        s.update(self.ln_mlp.specs(join(p, "ln_mlp")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = self.ln_attn(params, join(p, "ln_attn"), x) \
            if self.pre_norm else x
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = x + a
        if not self.pre_norm:
            x = self.ln_attn(params, join(p, "ln_attn"), x)
        h = self.ln_mlp(params, join(p, "ln_mlp"), x) \
            if self.pre_norm else x
        x = x + self.mlp(params, join(p, "mlp"), h)
        if not self.pre_norm:
            x = self.ln_mlp(params, join(p, "ln_mlp"), x)
        return x, None, kv


class OPTForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        c = config
        hf = c.hf_config
        self.word_dim = int(getattr(hf, "word_embed_proj_dim",
                                    c.hidden_size))
        super().__init__(c)
        self.decoder_layers = [
            OPTDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.pre_norm = bool(getattr(hf, "do_layer_norm_before", True))
        self.final_norm = (LayerNorm(c.hidden_size, 1e-5, c.dtype)
                           if self.pre_norm else None)
        self.n_positions = int(c.max_position_embeddings)

    def param_specs(self) -> SpecTree:
        c = self.config
        s = {
            "embed/weight": ParamSpec((c.vocab_size, self.word_dim),
                                      c.dtype),
            "wpe/weight": ParamSpec(
                (self.n_positions + 2, c.hidden_size), c.dtype, P(),
                init_scale=0.02,
            ),
        }
        if self.word_dim != c.hidden_size:
            s["project_in/weight"] = ParamSpec(
                (self.word_dim, c.hidden_size), c.dtype
            )
            s["project_out/weight"] = ParamSpec(
                (c.hidden_size, self.word_dim), c.dtype
            )
        if self.final_norm is not None:
            s.update(self.final_norm.specs("final_norm"))
        for i, layer in enumerate(self.decoder_layers):
            s.update(layer.specs(f"layers/{i}"))
        return s

    def __call__(self, params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        x = params["embed/weight"][fb.input_ids]
        if self.word_dim != self.config.hidden_size:
            x = jnp.dot(x, params["project_in/weight"])
        pos = jnp.clip(fb.positions, 0, self.n_positions - 1) + 2
        x = x + params["wpe/weight"][pos]
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        if self.final_norm is not None:
            x = self.final_norm(params, "final_norm", x)
        if self.word_dim != self.config.hidden_size:
            x = jnp.dot(x, params["project_out/weight"])
        return x, kv

    def compute_logits(self, params, hidden):
        return jnp.dot(hidden, params["embed/weight"].T)  # tied

    def map_hf_weight(self, name: str, arr: np.ndarray):
        for pre in ("model.decoder.", "decoder."):
            if name.startswith(pre):
                name = name[len(pre):]
                break
        if name == "embed_tokens.weight":
            return [("embed/weight", None, arr)]
        if name == "embed_positions.weight":
            return [("wpe/weight", None, arr)]
        if name.startswith("final_layer_norm."):
            if self.final_norm is None:
                return []
            return [(f"final_norm/{name.split('.')[1]}", None, arr)]
        if name == "project_in.weight":
            return [("project_in/weight", None, arr.T)]
        if name == "project_out.weight":
            return [("project_out/weight", None, arr.T)]
        if name == "lm_head.weight":
            return []  # tied to embed
        if not name.startswith("layers."):
            return []
        idx, sub = name[len("layers."):].split(".", 1)
        p = f"layers/{idx}"
        m = {
            "self_attn.q_proj.weight": (f"{p}/attn/q_proj/weight", None, "t"),
            "self_attn.q_proj.bias": (f"{p}/attn/q_proj/bias", None, ""),
            "self_attn.k_proj.weight": (f"{p}/attn/kv_proj/weight", 0, "t"),
            "self_attn.k_proj.bias": (f"{p}/attn/kv_proj/bias", 0, ""),
            "self_attn.v_proj.weight": (f"{p}/attn/kv_proj/weight", 1, "t"),
            "self_attn.v_proj.bias": (f"{p}/attn/kv_proj/bias", 1, ""),
            "self_attn.out_proj.weight": (f"{p}/attn/o_proj/weight", None,
                                          "t"),
            "self_attn.out_proj.bias": (f"{p}/attn/o_proj/bias", None, ""),
            "fc1.weight": (f"{p}/mlp/fc1/weight", None, "t"),
            "fc1.bias": (f"{p}/mlp/fc1/bias", None, ""),
            "fc2.weight": (f"{p}/mlp/fc2/weight", None, "t"),
            "fc2.bias": (f"{p}/mlp/fc2/bias", None, ""),
            "self_attn_layer_norm.weight": (f"{p}/ln_attn/weight", None, ""),
            "self_attn_layer_norm.bias": (f"{p}/ln_attn/bias", None, ""),
            "final_layer_norm.weight": (f"{p}/ln_mlp/weight", None, ""),
            "final_layer_norm.bias": (f"{p}/ln_mlp/bias", None, ""),
        }
        if sub in m:
            pn, slot, tf = m[sub]
            return [(pn, slot, arr.T if tf else arr)]
        return []
