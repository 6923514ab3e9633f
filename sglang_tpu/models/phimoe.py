"""PhiMoE (Phi-3.5-MoE). Behavioral reference: srt/models/phimoe.py + HF
modeling_phimoe.

Mixtral-shaped 16-expert top-2 MoE with three Phi quirks:
  - sparsemixer routing (inference path): per-expert jitter-masked
    softmax weights, NOT renormalized over the top-2
    (HF sparsemixer, modeling_phimoe.py:605).
  - full LayerNorm (weight+bias) everywhere instead of RMSNorm, and
    biases on q/k/v/o projections and the lm_head when configured.
  - LongRoPE scaling (short/long per-frequency factors; layers/rotary.py).

Token-identical to HF greedy (tests/test_model_zoo_r5.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.embedding import LMHead
from sglang_tpu.layers.linear import RowParallelLinear
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.layers.rotary import RotaryEmbedding
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


def sparsemixer_route(scores: jax.Array, jitter_eps: float):
    """Inference-path sparsemixer (HF modeling_phimoe.py:605, top_k=2).

    Expert i's weight is softmax over scores masked to the experts within
    a 2*eps relative band of the i-th max; the two weights are not
    renormalized against each other. scores: [T, E] float32.
    """
    neg_inf = jnp.float32(-jnp.inf)

    def one(scores_masked, scores_full):
        mx = jnp.max(scores_masked, axis=-1, keepdims=True)
        idx = jnp.argmax(scores_masked, axis=-1)
        factor = jnp.maximum(jnp.abs(scores_full), mx)
        mask = ((mx - scores_full) / factor) > (2 * jitter_eps)
        gates = jax.nn.softmax(
            jnp.where(mask, neg_inf, scores_masked), axis=-1
        )
        w = jnp.take_along_axis(gates, idx[:, None], axis=-1)[:, 0]
        return w, idx.astype(jnp.int32)

    w1, idx1 = one(scores, scores)
    masked = jnp.where(
        jax.nn.one_hot(idx1, scores.shape[-1], dtype=bool), neg_inf, scores
    )
    w2, idx2 = one(masked, scores)
    return jnp.stack([w1, w2], -1), jnp.stack([idx1, idx2], -1)


class PhimoeAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        super().__init__(config, layer_id)
        c = config
        # HF puts attention_bias on o_proj too (llama keeps it unbiased).
        self.o_proj = RowParallelLinear(
            self.nq * self.hd, c.hidden_size, c.dtype, c.attention_bias
        )
        scaling = c.rope_scaling
        if scaling and scaling.get("type", scaling.get("rope_type")) == "longrope":
            scaling = dict(scaling, rope_type="longrope")
            scaling.setdefault(
                "original_max_position_embeddings",
                int(getattr(c.hf_config, "original_max_position_embeddings",
                            0) or c.context_length),
            )
        self.rotary = RotaryEmbedding(
            self.hd, None, c.context_length, c.rope_theta, scaling
        )


class PhimoeDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        jitter = float(getattr(c.hf_config, "router_jitter_noise", 0.01))
        self.attn = PhimoeAttention(c, layer_id)
        self.mlp = FusedMoE(
            num_experts=c.num_experts,
            top_k=c.num_experts_per_tok,
            hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            dtype=c.dtype,
            route_fn=lambda s: sparsemixer_route(s, jitter),
        )
        self.input_norm = LayerNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.post_norm = LayerNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

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


class PhimoeForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        c = config
        self.decoder_layers = [
            PhimoeDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = LayerNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.lm_head = LMHead(
            c.vocab_size, c.hidden_size, c.dtype,
            bias=bool(getattr(c.hf_config, "lm_head_bias", False)),
        )

    def __call__(self, params, fb, kv, attn_backend, lora=None,
                 input_embeds=None, embed_mask=None):
        x = self.embed(params, "embed", fb.input_ids)
        if input_embeds is not None:
            x = jnp.where(embed_mask[:, None], input_embeds.astype(x.dtype), x)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def map_hf_weight(self, name: str, arr: np.ndarray):
        pre = self.hf_prefix
        if name == f"{pre}.norm.bias":
            return [("final_norm/bias", None, arr)]
        if name == "lm_head.bias":
            return [("lm_head/bias", None, arr)]
        if ".block_sparse_moe." in name:
            rest = name[len(pre) + 8:]
            idx, sub = rest.split(".", 1)
            p = f"layers/{idx}/mlp"
            if sub == "block_sparse_moe.gate.weight":
                return [(f"{p}/router", None, arr.T)]
            parts = sub.split(".")
            e, w = int(parts[2]), parts[3]
            if w == "w1":
                return [(f"{p}/w_gate_up", ("expert_gate", e), arr.T)]
            if w == "w3":
                return [(f"{p}/w_gate_up", ("expert_up", e), arr.T)]
            if w == "w2":
                return [(f"{p}/w_down", ("expert_down", e), arr.T)]
            return []
        if name.startswith(f"{pre}.layers.") and name.endswith("norm.bias"):
            rest = name[len(pre) + 8:]
            idx, sub = rest.split(".", 1)
            which = ("input_norm" if sub.startswith("input_layernorm")
                     else "post_norm")
            return [(f"layers/{idx}/{which}/bias", None, arr)]
        if ".self_attn.o_proj.bias" in name:
            rest = name[len(pre) + 8:]
            idx, _ = rest.split(".", 1)
            return [(f"layers/{idx}/attn/o_proj/bias", None, arr)]
        return super().map_hf_weight(name, arr)
