"""DeepSeek-V2 family: MLA attention + shared/routed-expert MoE.

Behavioral reference: srt/models/deepseek_v2.py (and HF
modeling_deepseek_v2 for exact numerics). Implementation notes:

- MLA runs in the ABSORBED form end-to-end (ref absorbed decode,
  srt/models/deepseek_v2.py + MLATokenToKVPool memory_pool.py:3910): the
  cache holds ONE row per token — the normed latent (kv_lora_rank) ++ the
  roped shared k_pe — and attention is MQA-style over it. W_UK is absorbed
  into q (q_nope @ W_UK lands q in latent space) and W_UV is applied to
  the latent-space output. Numerically identical to the naive decompressed
  form (pure associativity), with kv_lora+rope bytes per token instead of
  2*nh*qk_head_dim — ~8-14x less KV traffic and storage.
- Rope is DeepSeek's INTERLEAVED complex convention (consecutive pairs),
  not neox half-split.
- MoE: greedy or group_limited_greedy top-k over softmax scores, scaled by
  routed_scaling_factor (no renormalization — matches HF), plus shared
  experts; dense layers for layer_idx < first_k_dense_replace. Experts run
  as dropless grouped GEMMs (ragged_dot).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.base import ParamSpec, Params, SpecTree, join
from sglang_tpu.layers.embedding import LMHead, VocabEmbedding
from sglang_tpu.layers.linear import (
    ColumnParallelLinear,
    FusedColumnLinear,
    RowParallelLinear,
)
from sglang_tpu.layers.moe import FusedMoE
from sglang_tpu.layers.norms import RMSNorm
from sglang_tpu.model_exec.forward_batch import ForwardBatch
from sglang_tpu.models.llama import LlamaForCausalLM, LlamaMLP
from jax.sharding import PartitionSpec as P


def _interleaved_rope_tables(dim: int, max_pos: int, theta: float,
                             rope_scaling=None):
    inv = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    mscale = 1.0
    if rope_scaling and rope_scaling.get(
        "rope_type", rope_scaling.get("type", "")
    ) == "yarn":
        # Real DeepSeek-V2/V3 checkpoints extend context with YaRN
        # (mscale_all_dim variant); HF applies attention_factor to cos/sin.
        from sglang_tpu.layers.rotary import apply_yarn_scaling

        inv, mscale = apply_yarn_scaling(dim, theta, rope_scaling, max_pos)
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)  # [max_pos, dim/2]
    return jnp.cos(freqs) * mscale, jnp.sin(freqs) * mscale


def _apply_interleaved_rope(x, cos, sin):
    """x [T, H, D]; cos/sin [T, D/2]; pairs (2i, 2i+1) rotated (complex)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    c = cos[:, None, :]
    s = sin[:, None, :]
    o0 = x0 * c - x1 * s
    o1 = x0 * s + x1 * c
    out = jnp.stack([o0, o1], axis=-1).reshape(x.shape)
    return out.astype(dtype)


class DSAIndexer:
    """DeepSeek V3.2 lightning indexer (ref srt/layers/attention/dsa/
    dsa_indexer.py Indexer + kernels/ops/attention/dsa fp8_index).

    Scores every cached token with a cheap shared-key head:
        score[t, j] = sum_h gate[t, h] * relu(q[t, h] . k[j])
    where q = wq_b(q_lora) (roped on the first qk_rope_head_dim dims,
    NEOX convention — unlike the main MLA rope, which is interleaved),
    k = k_norm(wk(x)) (roped likewise, cached per token), and
    gate = weights_proj(x) * n_heads^-0.5 * head_dim^-0.5 (both scale
    factors pre-absorbed here; the reference's fp8 q_scale is moot in
    bf16). The reference's Hadamard rotate_activation is dropped: it is
    applied to both q and k, so logits are preserved; it only conditions
    the fp8 index cache we don't quantize."""

    def __init__(self, config: ModelConfig, q_lora_rank: int):
        from sglang_tpu.layers.norms import LayerNorm
        from sglang_tpu.layers.rotary import RotaryEmbedding

        c = config
        hf = c.hf_config
        self.h = hf.index_n_heads
        self.d = hf.index_head_dim
        self.rope_d = hf.qk_rope_head_dim
        self.topk = hf.index_topk
        dt = c.dtype
        self.wq_b = ColumnParallelLinear(q_lora_rank, self.h * self.d, dt)
        self.wk = ColumnParallelLinear(c.hidden_size, self.d, dt)
        self.weights_proj = ColumnParallelLinear(c.hidden_size, self.h, dt)
        if getattr(hf, "index_k_norm_type", "layer") == "rms":
            self.k_norm = RMSNorm(self.d, 1e-6, dt)
        else:
            self.k_norm = LayerNorm(self.d, 1e-5, dt)
        self.rotary = RotaryEmbedding(
            self.d, self.rope_d, c.context_length, c.rope_theta,
            c.rope_scaling,
        )
        self.gate_scale = self.h**-0.5 * self.d**-0.5

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.wq_b.specs(join(p, "wq_b")))
        s.update(self.wk.specs(join(p, "wk")))
        s.update(self.weights_proj.specs(join(p, "weights_proj")))
        s.update(self.k_norm.specs(join(p, "k_norm")))
        return s

    def __call__(self, params, p, x, q_lora, fb: ForwardBatch):
        T = x.shape[0]
        q = self.wq_b(params, join(p, "wq_b"), q_lora).reshape(
            T, self.h, self.d
        )
        k = self.k_norm(
            params, join(p, "k_norm"), self.wk(params, join(p, "wk"), x)
        ).reshape(T, 1, self.d)
        q, k = self.rotary(fb.positions, q, k)
        gates = (
            self.weights_proj(params, join(p, "weights_proj"), x)
            * self.gate_scale
        )
        return q, k[:, 0, :], gates


class DeepseekV2Attention:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        hf = c.hf_config
        self.layer_id = layer_id
        self.nh = c.num_attention_heads
        self.nope = hf.qk_nope_head_dim
        self.rope = hf.qk_rope_head_dim
        self.qk_hd = self.nope + self.rope
        self.v_hd = hf.v_head_dim
        self.q_lora_rank = getattr(hf, "q_lora_rank", None)
        self.kv_lora_rank = hf.kv_lora_rank
        dt = c.dtype
        H = c.hidden_size
        if self.q_lora_rank:
            self.q_a = ColumnParallelLinear(H, self.q_lora_rank, dt)
            self.q_a_norm = RMSNorm(self.q_lora_rank, c.rms_norm_eps, dt)
            self.q_b = ColumnParallelLinear(
                self.q_lora_rank, self.nh * self.qk_hd, dt
            )
        else:
            self.q_proj = ColumnParallelLinear(H, self.nh * self.qk_hd, dt)
        self.kv_a = ColumnParallelLinear(
            H, self.kv_lora_rank + self.rope, dt
        )
        self.kv_a_norm = RMSNorm(self.kv_lora_rank, c.rms_norm_eps, dt)
        self.kv_b = ColumnParallelLinear(
            self.kv_lora_rank, self.nh * (self.nope + self.v_hd), dt
        )
        self.o_proj = RowParallelLinear(self.nh * self.v_hd, H, dt)
        self.cos, self.sin = _interleaved_rope_tables(
            self.rope, c.context_length, c.rope_theta, c.rope_scaling
        )
        self.scale = self.qk_hd**-0.5
        # DSA (DeepSeek V3.2): an index_topk attr on the HF config enables
        # the lightning indexer + sparse attention (ref is_deepseek_dsa,
        # srt/configs/model_config.py:106).
        self.indexer = None
        if getattr(hf, "index_topk", None) and self.q_lora_rank:
            self.indexer = DSAIndexer(c, self.q_lora_rank)

    def specs(self, p: str) -> SpecTree:
        s = {}
        if self.q_lora_rank:
            s.update(self.q_a.specs(join(p, "q_a")))
            s.update(self.q_a_norm.specs(join(p, "q_a_norm")))
            s.update(self.q_b.specs(join(p, "q_b")))
        else:
            s.update(self.q_proj.specs(join(p, "q_proj")))
        s.update(self.kv_a.specs(join(p, "kv_a")))
        s.update(self.kv_a_norm.specs(join(p, "kv_a_norm")))
        s.update(self.kv_b.specs(join(p, "kv_b")))
        s.update(self.o_proj.specs(join(p, "o_proj")))
        if self.indexer is not None:
            s.update(self.indexer.specs(join(p, "indexer")))
        return s

    def __call__(self, params, p, x, fb: ForwardBatch, kv, attn_backend,
                 lora=None):
        from sglang_tpu.quantization import full_weight

        T = x.shape[0]
        q_lora = None
        if self.q_lora_rank:
            q_lora = self.q_a_norm(
                params, join(p, "q_a_norm"),
                self.q_a(params, join(p, "q_a"), x),
            )
            q = self.q_b(params, join(p, "q_b"), q_lora)
        else:
            q = self.q_proj(params, join(p, "q_proj"), x)
        q = q.reshape(T, self.nh, self.qk_hd)
        q_nope, q_pe = q[..., : self.nope], q[..., self.nope:]

        ckv = self.kv_a(params, join(p, "kv_a"), x)
        c_latent = self.kv_a_norm(
            params, join(p, "kv_a_norm"), ckv[:, : self.kv_lora_rank]
        )
        k_pe = ckv[:, self.kv_lora_rank:].reshape(T, 1, self.rope)

        cos = self.cos[fb.positions]
        sin = self.sin[fb.positions]
        q_pe = _apply_interleaved_rope(q_pe, cos, sin)
        k_pe = _apply_interleaved_rope(k_pe, cos, sin)[:, 0, :]  # [T, rope]

        # Absorb W_UK into q: scores over the latent equal the naive
        # q_nope . k_nope because k_nope = c_latent @ W_UK per head.
        w_b = full_weight(
            params, join(p, "kv_b", "weight"), x.dtype
        ).reshape(self.kv_lora_rank, self.nh, self.nope + self.v_hd)
        w_uk = w_b[..., : self.nope]  # [c, nh, nope]
        w_uv = w_b[..., self.nope:]  # [c, nh, v_hd]
        q_abs = jnp.einsum(
            "thd,chd->thc", q_nope, w_uk, preferred_element_type=q_nope.dtype
        )  # [T, nh, kv_lora_rank]
        q_m = jnp.concatenate([q_abs, q_pe], axis=-1)  # [T, nh, c+rope]
        rows = jnp.concatenate([c_latent, k_pe], axis=-1)  # [T, c+rope]

        if self.indexer is not None:
            idx_q, idx_k, gates = self.indexer(
                params, join(p, "indexer"), x, q_lora, fb
            )
            out_lat, kv = attn_backend.mla_sparse(
                q_m, rows, idx_q, idx_k, gates, self.layer_id, kv, fb,
                v_dim=self.kv_lora_rank, scale=self.scale,
                index_topk=self.indexer.topk,
            )
        else:
            out_lat, kv = attn_backend.mla(
                q_m, rows, self.layer_id, kv, fb,
                v_dim=self.kv_lora_rank, scale=self.scale,
            )  # [T, nh, kv_lora_rank]
        out = jnp.einsum(
            "thc,chd->thd", out_lat, w_uv,
            preferred_element_type=out_lat.dtype,
        ).reshape(T, self.nh * self.v_hd)
        out = self.o_proj(params, join(p, "o_proj"), out)
        return out, kv


class DeepseekV2MoE:
    def __init__(self, config: ModelConfig):
        c = config
        hf = c.hf_config
        self.n_experts = hf.n_routed_experts
        self.top_k = hf.num_experts_per_tok
        self.n_group = getattr(hf, "n_group", 1) or 1
        self.topk_group = getattr(hf, "topk_group", 1) or 1
        self.topk_method = getattr(hf, "topk_method", "greedy") or "greedy"
        # HF's V3 port drops scoring_func/topk_method and hardcodes the
        # sigmoid router — detect by model_type (V3/V3.2 checkpoints).
        self.sigmoid_routing = (
            getattr(hf, "scoring_func", None) == "sigmoid"
            or self.topk_method == "noaux_tc"
            or str(getattr(hf, "model_type", "")).startswith("deepseek_v3")
        )
        self.norm_topk = bool(getattr(hf, "norm_topk_prob", False))
        self.routed_scaling = getattr(hf, "routed_scaling_factor", 1.0)
        self.moe = FusedMoE(
            num_experts=self.n_experts,
            top_k=self.top_k,
            hidden_size=c.hidden_size,
            intermediate_size=hf.moe_intermediate_size,
            dtype=c.dtype,
        )
        n_shared = getattr(hf, "n_shared_experts", 0) or 0
        self.shared = None
        self.sbo = False
        if n_shared:
            shared_inter = hf.moe_intermediate_size * n_shared
            self.sh_gate_up = FusedColumnLinear(
                c.hidden_size, 2, shared_inter, c.dtype
            )
            self.sh_down = RowParallelLinear(shared_inter, c.hidden_size,
                                             c.dtype)
            self.shared = True
            from sglang_tpu.layers.moe import get_sbo
            from sglang_tpu.quantization import get_quant_method

            # SBO (layers/moe.py set_sbo): shared weights ship replicated
            # and unquantized so the shared FFN can run on each EP shard's
            # local token slice inside the dispatch shard_map.
            self.sbo = get_sbo() and not get_quant_method()

    def specs(self, p: str) -> SpecTree:
        s = self.moe.specs(p)
        if self.sigmoid_routing:
            from jax.sharding import PartitionSpec as P

            s[join(p, "router_bias")] = ParamSpec(
                (self.n_experts,), jnp.float32, P(), init_scale=0.0
            )
        if self.shared:
            s.update(self.sh_gate_up.specs(join(p, "shared_gate_up")))
            s.update(self.sh_down.specs(join(p, "shared_down")))
            if self.sbo:
                # Replicate (and de-quantize) the shared weights: the SBO
                # chain computes them per-shard on local rows.
                import dataclasses as _dc

                from jax.sharding import PartitionSpec as P

                for k in (join(p, "shared_gate_up/weight"),
                          join(p, "shared_down/weight")):
                    s[k] = _dc.replace(
                        s[k], spec=P(*([None] * len(s[k].shape))),
                        quant_method=None,
                    )
        return s

    def _route(self, params, p, x):
        """HF DeepseekV2MoEGate numerics: softmax scores, (group-limited)
        top-k, scaled by routed_scaling_factor, NOT renormalized.
        DeepSeek-V3 (scoring_func=sigmoid / topk_method=noaux_tc):
        sigmoid scores + e_score_correction_bias selection, top-2-sum
        group scores, optional renormalize (glm4_moe.sigmoid_group_topk)."""
        logits = jnp.dot(
            x.astype(jnp.float32),
            params[join(p, "router")].astype(jnp.float32),
        )
        if self.sigmoid_routing:
            from sglang_tpu.models.glm4_moe import sigmoid_group_topk

            return sigmoid_group_topk(
                jax.nn.sigmoid(logits), params[join(p, "router_bias")],
                self.top_k, self.n_group, self.topk_group, self.norm_topk,
                self.routed_scaling,
            )
        scores = jax.nn.softmax(logits, axis=-1)  # [T, E]
        if self.topk_method == "group_limited_greedy" and self.n_group > 1:
            T = scores.shape[0]
            per = self.n_experts // self.n_group
            g = scores.reshape(T, self.n_group, per).max(axis=-1)  # [T, G]
            _, gidx = jax.lax.top_k(g, self.topk_group)
            gmask = jnp.zeros_like(g).at[
                jnp.arange(T)[:, None], gidx
            ].set(1.0)
            mask = jnp.repeat(gmask, per, axis=1)
            scores = scores * mask
        w, idx = jax.lax.top_k(scores, self.top_k)
        return w * self.routed_scaling, idx

    def __call__(self, params, p, x, lora=None):
        from sglang_tpu.eplb import maybe_record
        from sglang_tpu.layers.base import join as _join

        w, idx = self._route(params, p, x)
        maybe_record(p, idx, self.n_experts)
        idx = params[_join(p, "eplb_log2phy")][idx]  # EPLB placement
        if self.shared and self.sbo:
            # SBO: shared-expert FFN rides inside the EP dispatch
            # (layers/moe.py shared_expert_ffn).
            shared = (params[join(p, "shared_gate_up/weight")],
                      params[join(p, "shared_down/weight")])
            return self.moe.compute_experts(params, p, x, w, idx,
                                            shared=shared)
        out = self.moe.compute_experts(params, p, x, w, idx)
        if self.shared:
            h = silu_and_mul(
                self.sh_gate_up(params, join(p, "shared_gate_up"), x)
            )
            out = out + self.sh_down(params, join(p, "shared_down"), h)
        return out


class DeepseekV2DecoderLayer:
    def __init__(self, config: ModelConfig, layer_id: int):
        c = config
        hf = c.hf_config
        self.attn = DeepseekV2Attention(c, layer_id)
        first_dense = getattr(hf, "first_k_dense_replace", 0)
        moe_freq = getattr(hf, "moe_layer_freq", 1) or 1
        use_moe = (
            getattr(hf, "n_routed_experts", 0)
            and layer_id >= first_dense
            and layer_id % moe_freq == 0
        )
        self.mlp = DeepseekV2MoE(c) if use_moe else LlamaMLP(c, layer_id)
        self.input_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.post_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)

    def specs(self, p: str) -> SpecTree:
        s = {}
        s.update(self.attn.specs(join(p, "attn")))
        s.update(self.mlp.specs(join(p, "mlp")))
        s.update(self.input_norm.specs(join(p, "input_norm")))
        s.update(self.post_norm.specs(join(p, "post_norm")))
        return s

    def __call__(self, params, p, x, residual, fb, kv, attn_backend,
                 lora=None):
        if residual is None:
            residual = x
            x = self.input_norm(params, join(p, "input_norm"), x)
        else:
            x, residual = self.input_norm(params, join(p, "input_norm"), x,
                                          residual)
        x, kv = self.attn(params, join(p, "attn"), x, fb, kv, attn_backend)
        x, residual = self.post_norm(params, join(p, "post_norm"), x, residual)
        if isinstance(self.mlp, LlamaMLP):
            x = self.mlp(params, join(p, "mlp"), x, lora=lora)
        else:
            x = self.mlp(params, join(p, "mlp"), x)
        return x, residual, kv


class DeepseekV2ForCausalLM(LlamaForCausalLM):
    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        hf = c.hf_config
        # Latent KV pool row width (ModelRunner sizes the pool from this;
        # ref MLATokenToKVPool memory_pool.py:3910).
        self.mla_dim = hf.kv_lora_rank + hf.qk_rope_head_dim
        # DSA (V3.2): sizes the per-layer index-K cache pool (0 = no DSA).
        self.dsa_index_dim = (
            int(hf.index_head_dim)
            if getattr(hf, "index_topk", None) else 0
        )
        self.embed = VocabEmbedding(c.vocab_size, c.hidden_size, c.dtype)
        self.decoder_layers = [
            DeepseekV2DecoderLayer(c, i) for i in range(c.num_hidden_layers)
        ]
        self.final_norm = RMSNorm(c.hidden_size, c.rms_norm_eps, c.dtype)
        self.lm_head = LMHead(c.vocab_size, c.hidden_size, c.dtype)

    def map_hf_weight(self, name: str, arr: np.ndarray):
        pre = "model"
        if name == f"{pre}.embed_tokens.weight":
            return [("embed/weight", None, arr)]
        if name == "lm_head.weight":
            if self.config.tie_word_embeddings:
                return []
            return [("lm_head/weight", None, arr)]
        if name == f"{pre}.norm.weight":
            return [("final_norm/weight", None, arr)]
        if not name.startswith(f"{pre}.layers."):
            return []
        rest = name[len(pre) + 8:]
        idx, sub = rest.split(".", 1)
        p = f"layers/{idx}"
        flat = {
            "self_attn.q_proj.weight": (f"{p}/attn/q_proj/weight", None, "t"),
            "self_attn.q_a_proj.weight": (f"{p}/attn/q_a/weight", None, "t"),
            "self_attn.q_a_layernorm.weight": (f"{p}/attn/q_a_norm/weight", None, ""),
            "self_attn.q_b_proj.weight": (f"{p}/attn/q_b/weight", None, "t"),
            "self_attn.kv_a_proj_with_mqa.weight": (f"{p}/attn/kv_a/weight", None, "t"),
            "self_attn.kv_a_layernorm.weight": (f"{p}/attn/kv_a_norm/weight", None, ""),
            "self_attn.kv_b_proj.weight": (f"{p}/attn/kv_b/weight", None, "t"),
            "self_attn.o_proj.weight": (f"{p}/attn/o_proj/weight", None, "t"),
            # DSA lightning indexer (V3.2)
            "self_attn.indexer.wq_b.weight": (
                f"{p}/attn/indexer/wq_b/weight", None, "t"),
            "self_attn.indexer.wk.weight": (
                f"{p}/attn/indexer/wk/weight", None, "t"),
            "self_attn.indexer.weights_proj.weight": (
                f"{p}/attn/indexer/weights_proj/weight", None, "t"),
            "self_attn.indexer.k_norm.weight": (
                f"{p}/attn/indexer/k_norm/weight", None, ""),
            "self_attn.indexer.k_norm.bias": (
                f"{p}/attn/indexer/k_norm/bias", None, ""),
            "input_layernorm.weight": (f"{p}/input_norm/weight", None, ""),
            "post_attention_layernorm.weight": (f"{p}/post_norm/weight", None, ""),
            # dense MLP layers
            "mlp.gate_proj.weight": (f"{p}/mlp/gate_up/weight", 0, "t"),
            "mlp.up_proj.weight": (f"{p}/mlp/gate_up/weight", 1, "t"),
            "mlp.down_proj.weight": (f"{p}/mlp/down/weight", None, "t"),
            # MoE router + shared experts
            "mlp.gate.weight": (f"{p}/mlp/router", None, "t"),
            "mlp.gate.e_score_correction_bias": (
                f"{p}/mlp/router_bias", None, ""),
            "mlp.shared_experts.gate_proj.weight": (
                f"{p}/mlp/shared_gate_up/weight", 0, "t"),
            "mlp.shared_experts.up_proj.weight": (
                f"{p}/mlp/shared_gate_up/weight", 1, "t"),
            "mlp.shared_experts.down_proj.weight": (
                f"{p}/mlp/shared_down/weight", None, "t"),
        }
        if sub in flat:
            pname, slot, tf = flat[sub]
            if "t" in tf:
                arr = arr.T
            return [(pname, slot, arr)]
        if sub.startswith("mlp.experts."):
            parts = sub.split(".")
            e = int(parts[2])
            w = parts[3]
            m = {
                "gate_proj": ("expert_gate", e),
                "up_proj": ("expert_up", e),
                "down_proj": ("expert_down", e),
            }
            if w in m:
                target = (
                    f"{p}/mlp/w_gate_up" if w != "down_proj"
                    else f"{p}/mlp/w_down"
                )
                return [(target, m[w], arr.T)]
        return []
