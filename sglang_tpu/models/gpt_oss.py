"""GPT-OSS decoder (OpenAI open-weight MoE). Ref: srt/models/gpt_oss.py.

Architecture vs Llama:
- Attention sinks: a learned per-q-head logit joins every softmax (its
  probability mass is dropped from the output) — handled by the attention
  backends via the `sinks` argument.
- Alternating sliding/full attention via config.layer_types.
- Biases on q/k/v/o projections and on the expert FFNs.
- MoE: top-k router (with bias) softmaxed over the selected logits;
  experts use the clamped swiglu  glu = clamp(gate) * sigmoid(1.702 *
  clamp(gate)); out = (clamp(up) + 1) * glu  with gate/up INTERLEAVED in
  the checkpoint's fused gate_up tensor (deinterleaved at load).
- YARN rope (layers/rotary.py apply_yarn_scaling, HF-exact incl. the
  truncate=False GPT-OSS variant).
Greedy decode is token-identical to HF (tests/test_gpt_oss.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM
from sglang_tpu.layers.linear import RowParallelLinear
from jax.sharding import PartitionSpec as P
from sglang_tpu.parallel.mesh import AXIS_TP


class GptOssAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        layer_types = list(getattr(c.hf_config, "layer_types", []) or [])
        self.window = (
            int(c.hf_config.sliding_window)
            if layer_id < len(layer_types)
            and layer_types[layer_id] == "sliding_attention"
            else 0
        )
        # o_proj carries a bias in GPT-OSS (LlamaAttention's does not).
        self.o_proj = RowParallelLinear(
            self.nq * self.hd, c.hidden_size, c.dtype, bias=True
        )

    def specs(self, p: str) -> SpecTree:
        s = super().specs(p)
        s[join(p, "sinks")] = ParamSpec((self.nq,), jnp.float32)
        return s

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        T = x.shape[0]
        q = self.q_proj(params, join(p, "q_proj"), x).reshape(
            T, self.nq, self.hd
        )
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k = kv_new[:, 0, :].reshape(T, self.nk, self.hd)
        v = kv_new[:, 1, :].reshape(T, self.nk, self.hd)
        q, k = self.rotary(fb.positions, q, k)
        out, kv = attn_backend(
            q, k, v, self.layer_id, kv, fb,
            window=self.window, sinks=params[join(p, "sinks")],
        )
        out = self.o_proj(params, join(p, "o_proj"), out.reshape(T, -1))
        return out, kv


class GptOssMoE:
    """Top-k router (biased) + clamped-swiglu experts with biases."""

    ALPHA = 1.702
    LIMIT = 7.0

    def __init__(self, config: ModelConfig):
        c = config
        self.num_experts = c.num_experts
        self.top_k = c.num_experts_per_tok
        self.hidden = c.hidden_size
        self.inter = c.intermediate_size
        self.dtype = c.dtype

    def specs(self, p: str) -> SpecTree:
        E, H, I = self.num_experts, self.hidden, self.inter
        dt = self.dtype
        return {
            join(p, "router/weight"): ParamSpec((H, E), dt),
            join(p, "router/bias"): ParamSpec((E,), dt),
            join(p, "w_gate_up"): ParamSpec(
                (E, H, 2, I), dt, P(None, None, None, AXIS_TP)
            ),
            join(p, "b_gate_up"): ParamSpec(
                (E, 2, I), dt, P(None, None, AXIS_TP)
            ),
            join(p, "w_down"): ParamSpec((E, I, H), dt, P(None, AXIS_TP, None)),
            join(p, "b_down"): ParamSpec((E, H), dt),
        }

    def __call__(self, params: Params, p: str, x: jax.Array) -> jax.Array:
        T, H = x.shape
        E, K = self.num_experts, self.top_k
        logits = (
            jnp.dot(x.astype(jnp.float32),
                    params[join(p, "router/weight")].astype(jnp.float32))
            + params[join(p, "router/bias")].astype(jnp.float32)
        )  # [T, E]
        topk_logits, topk_idx = jax.lax.top_k(logits, K)
        topk_w = jax.nn.softmax(topk_logits, axis=-1)

        flat_expert = topk_idx.reshape(-1)
        flat_w = topk_w.reshape(-1)
        order = jnp.argsort(flat_expert)
        token_of = order // K
        x_sorted = x[token_of]  # [TK, H]
        group_sizes = jnp.bincount(flat_expert, length=E).astype(jnp.int32)
        expert_of_row = jnp.repeat(
            jnp.arange(E, dtype=jnp.int32), group_sizes,
            total_repeat_length=T * K,
        )

        w_gu = params[join(p, "w_gate_up")]
        b_gu = params[join(p, "b_gate_up")]
        gate = jax.lax.ragged_dot(
            x_sorted, w_gu[:, :, 0, :], group_sizes,
            preferred_element_type=x.dtype,
        ) + b_gu[expert_of_row, 0, :]
        up = jax.lax.ragged_dot(
            x_sorted, w_gu[:, :, 1, :], group_sizes,
            preferred_element_type=x.dtype,
        ) + b_gu[expert_of_row, 1, :]
        gate = jnp.minimum(gate, self.LIMIT)
        up = jnp.clip(up, -self.LIMIT, self.LIMIT)
        glu = gate * jax.nn.sigmoid(gate * self.ALPHA)
        h = (up + 1.0) * glu
        out_sorted = jax.lax.ragged_dot(
            h, params[join(p, "w_down")], group_sizes,
            preferred_element_type=x.dtype,
        ) + params[join(p, "b_down")][expert_of_row]
        out_sorted = out_sorted * flat_w[order][:, None].astype(out_sorted.dtype)
        out = jnp.zeros((T, H), out_sorted.dtype)
        out = out.at[token_of].add(out_sorted)
        return out.astype(x.dtype)


class GptOssDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        self.attn = GptOssAttention(c, layer_id)
        self.moe = GptOssMoE(c)
        self.input_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.post_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.moe.specs(join(p, "moe")))
        s.update(self.input_norm.specs(join(p, "input_norm")))
        s.update(self.post_norm.specs(join(p, "post_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = self.input_norm(params, join(p, "input_norm"), x)
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = x + a
        h = self.post_norm(params, join(p, "post_norm"), x)
        x = x + self.moe(params, join(p, "moe"), h)
        return x, None, kv


class GptOssForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        self.decoder_layers = [
            GptOssDecoderLayer(config, i)
            for i in range(config.num_hidden_layers)
        ]

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

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}"
            if sub == "self_attn.sinks":
                return [(f"{p}/attn/sinks", None, arr)]
            if sub == "self_attn.o_proj.bias":
                return [(f"{p}/attn/o_proj/bias", None, arr)]
            if sub == "mlp.router.weight":
                return [(f"{p}/moe/router/weight", None, arr.T)]
            if sub == "mlp.router.bias":
                return [(f"{p}/moe/router/bias", None, arr)]
            if sub == "mlp.experts.gate_up_proj":
                # [E, H, 2I] interleaved -> [E, H, 2, I] slots
                gate = arr[:, :, 0::2]
                up = arr[:, :, 1::2]
                return [(f"{p}/moe/w_gate_up", None,
                         np.stack([gate, up], axis=2))]
            if sub == "mlp.experts.gate_up_proj_bias":
                return [(f"{p}/moe/b_gate_up", None,
                         np.stack([arr[:, 0::2], arr[:, 1::2]], axis=1))]
            if sub == "mlp.experts.down_proj":
                return [(f"{p}/moe/w_down", None, arr)]
            if sub == "mlp.experts.down_proj_bias":
                return [(f"{p}/moe/b_down", None, arr)]
        return super().map_hf_weight(name, arr)
