"""MPT (MosaicML): ALiBi MHA decoder, bias-free LayerNorms.

Behavioral reference: srt/models/mpt.py lineage + HF MptForCausalLM.
MPT's ALiBi slope ladder differs from Bloom's: 1/2^(i*bias_max/nh_p2)
with odd/even interleave when n_heads is not a power of two (HF
build_mpt_alibi_tensor). Fused Wqkv in q|k|v column blocks, optional
qkv clamp, 4H exact-gelu MLP, tied head.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.base import SpecTree, join
from sglang_tpu.layers.linear import ColumnParallelLinear, RowParallelLinear
from sglang_tpu.layers.norms import LayerNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaAttention, LlamaForCausalLM


def mpt_alibi_slopes(num_heads: int, bias_max: float = 8.0) -> np.ndarray:
    nh_p2 = 2 ** math.ceil(math.log2(num_heads))
    base = np.arange(1, nh_p2 + 1, dtype=np.float64) * (bias_max / nh_p2)
    slopes = 1.0 / np.power(2.0, base)
    if nh_p2 != num_heads:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:num_heads]
    return slopes.astype(np.float32)


class MptAttention(LlamaAttention):
    def __init__(self, config: ModelConfig, layer_id: int):
        config.attention_bias = False
        super().__init__(config, layer_id)
        ac = getattr(config.hf_config, "attn_config", None)
        bias_max = float(getattr(ac, "alibi_bias_max", 8) or 8)
        self.clip_qkv = getattr(ac, "clip_qkv", None)
        sm = getattr(ac, "softmax_scale", None)
        self.scale_override = float(sm) if sm else None
        self.alibi_slopes = jnp.asarray(
            mpt_alibi_slopes(self.nq, bias_max)
        )

    def apply_rotary(self, fb: ForwardBatch, q, k):
        return q, k

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        T = x.shape[0]
        q = self.q_proj(params, join(p, "q_proj"), x)
        kv_new = self.kv_proj(params, join(p, "kv_proj"), x)
        k = kv_new[:, 0, :]
        v = kv_new[:, 1, :]
        if self.clip_qkv:
            c = float(self.clip_qkv)
            q = jnp.clip(q, -c, c)
            k = jnp.clip(k, -c, c)
            v = jnp.clip(v, -c, c)
        q = q.reshape(T, self.nq, self.hd)
        k = k.reshape(T, self.nk, self.hd)
        v = v.reshape(T, self.nk, self.hd)
        out, kv = attn_backend(q, k, v, self.layer_id, kv, fb,
                               scale=self.scale_override,
                               alibi_slopes=self.alibi_slopes)
        return self.o_proj(params, join(p, "o_proj"),
                           out.reshape(T, -1)), kv


class MptMLP:
    def __init__(self, config: ModelConfig):
        c = config
        inner = int(getattr(c.hf_config, "expansion_ratio", 4)
                    ) * c.hidden_size
        self.fc1 = ColumnParallelLinear(c.hidden_size, inner, c.dtype,
                                        bias=False)
        self.fc2 = RowParallelLinear(inner, c.hidden_size, c.dtype,
                                     bias=False)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.fc1.specs(join(p, "fc1")))
        s.update(self.fc2.specs(join(p, "fc2")))
        return s

    def __call__(self, params, p, x, lora=None):
        h = self.fc1(params, join(p, "fc1"), x)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
            x.dtype
        )
        return self.fc2(params, join(p, "fc2"), h)


class MptDecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        eps = float(getattr(c.hf_config, "layer_norm_epsilon", 1e-5)
                    or 1e-5)
        self.attn = MptAttention(c, layer_id)
        self.mlp = MptMLP(c)
        self.norm_1 = LayerNorm(c.hidden_size, eps, c.dtype, bias=False)
        self.norm_2 = LayerNorm(c.hidden_size, eps, c.dtype, bias=False)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.norm_1.specs(join(p, "norm_1")))
        s.update(self.norm_2.specs(join(p, "norm_2")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        h = self.norm_1(params, join(p, "norm_1"), x)
        a, kv = self.attn(params, join(p, "attn"), h, fb, kv, attn_backend)
        x = x + a
        h = self.norm_2(params, join(p, "norm_2"), x)
        return x + self.mlp(params, join(p, "mlp"), h), None, kv


class MptForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        c = config
        c.tie_word_embeddings = True
        super().__init__(c)
        eps = float(getattr(c.hf_config, "layer_norm_epsilon", 1e-5)
                    or 1e-5)
        self.decoder_layers = [
            MptDecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = LayerNorm(c.hidden_size, eps, c.dtype,
                                    bias=False)

    def __call__(self, params, fb: ForwardBatch, kv, attn_backend,
                 lora=None, input_embeds=None, embed_mask=None
                 ) -> Tuple[jax.Array, tuple]:
        x = self.embed(params, "embed", fb.input_ids)
        for i, layer in enumerate(self.decoder_layers):
            x, _, kv = layer(params, f"layers/{i}", x, None, fb, kv,
                             attn_backend)
        x = self.final_norm(params, "final_norm", x)
        return x, kv

    def map_hf_weight(self, name: str, arr: np.ndarray):
        if name.startswith("transformer."):
            name = name[len("transformer."):]
        if name == "wte.weight":
            return [("embed/weight", None, arr)]
        if name == "norm_f.weight":
            return [("final_norm/weight", None, arr)]
        if name == "lm_head.weight":
            return []  # tied
        if not name.startswith("blocks."):
            return []
        idx, sub = name[len("blocks."):].split(".", 1)
        p = f"layers/{idx}"
        H = self.config.hidden_size
        if sub == "attn.Wqkv.weight":
            return [
                (f"{p}/attn/q_proj/weight", None, arr[:H].T),
                (f"{p}/attn/kv_proj/weight", 0, arr[H:2 * H].T),
                (f"{p}/attn/kv_proj/weight", 1, arr[2 * H:].T),
            ]
        m = {
            "attn.out_proj.weight": (f"{p}/attn/o_proj/weight", "t"),
            "ffn.up_proj.weight": (f"{p}/mlp/fc1/weight", "t"),
            "ffn.down_proj.weight": (f"{p}/mlp/fc2/weight", "t"),
            "norm_1.weight": (f"{p}/norm_1/weight", ""),
            "norm_2.weight": (f"{p}/norm_2/weight", ""),
        }
        if sub in m:
            pn, tf = m[sub]
            return [(pn, None, arr.T if tf else arr)]
        return []
