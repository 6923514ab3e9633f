"""Grok-1/2: greedy parity vs an independent torch reimplementation.

No HF transformers class exists for Grok, so the oracle here is a
from-scratch torch forward implementing the architecture described in
srt/models/grok.py: sandwich norms, tanh logit caps (attention + router),
gelu-tanh experts, embedding/output multipliers, and the Grok-2
residual-MoE dense branch.
"""

import json
import math
import os

import numpy as np
import pytest


def _torch_grok(cfg, weights, prompt, n_new):
    """Greedy-decode oracle: plain-python grok forward (float32)."""
    import torch
    import torch.nn.functional as F

    def w(name):
        return weights[name].float()

    def rms(x, g, eps=1e-5):
        v = x.pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(v + eps) * g

    H = cfg["hidden_size"]
    nq, nk, hd = (cfg["num_attention_heads"], cfg["num_key_value_heads"],
                  cfg["head_dim"])
    E, K = cfg["num_local_experts"], cfg["num_experts_per_tok"]
    cap = 30.0
    ids = list(prompt)
    for _ in range(n_new):
        x = w("model.embed_tokens.weight")[torch.tensor(ids)]
        x = x * cfg["embedding_multiplier_scale"]
        T = x.shape[0]
        pos = torch.arange(T)
        inv = 1.0 / (cfg["rope_theta"] ** (
            torch.arange(0, hd, 2, dtype=torch.float32) / hd))
        freqs = torch.outer(pos.float(), inv)
        cos, sin = freqs.cos(), freqs.sin()
        residual = x
        for i in range(cfg["num_hidden_layers"]):
            p = f"model.layers.{i}."
            h = rms(residual, w(p + "pre_attn_norm.weight"))
            q = (h @ w(p + "self_attn.q_proj.weight").T).view(T, nq, hd)
            kk = (h @ w(p + "self_attn.k_proj.weight").T).view(T, nk, hd)
            v = (h @ w(p + "self_attn.v_proj.weight").T).view(T, nk, hd)

            def rot(t):
                t1, t2 = t[..., : hd // 2], t[..., hd // 2:]
                return torch.cat(
                    [t1 * cos[:, None] - t2 * sin[:, None],
                     t2 * cos[:, None] + t1 * sin[:, None]], -1)

            q, kk = rot(q), rot(kk)
            g = nq // nk
            kr = kk.repeat_interleave(g, dim=1)
            vr = v.repeat_interleave(g, dim=1)
            scores = torch.einsum("tnd,snd->nts", q, kr) / math.sqrt(hd)
            scores = cap * torch.tanh(scores / cap)
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            scores = scores.masked_fill(~mask, float("-inf"))
            out = torch.einsum("nts,snd->tnd", scores.softmax(-1), vr)
            a = out.reshape(T, -1) @ w(p + "self_attn.o_proj.weight").T
            a = rms(a, w(p + "post_attn_norm.weight"))
            residual = residual + a
            h = rms(residual, w(p + "pre_moe_norm.weight"))
            # router: softcap -> softmax -> topk (no renorm)
            rl = h @ w(p + "block_sparse_moe.gate.weight").T
            rl = cap * torch.tanh(rl / cap)
            probs = rl.softmax(-1)
            topw, topi = probs.topk(K, dim=-1)
            f = torch.zeros_like(h)
            for e in range(E):
                sel = (topi == e)
                if not sel.any():
                    continue
                we = (topw * sel).sum(-1)
                g1 = h @ w(p + f"block_sparse_moe.experts.{e}.w1.weight").T
                g3 = h @ w(p + f"block_sparse_moe.experts.{e}.w3.weight").T
                eo = (F.gelu(g1, approximate="tanh") * g3) @ w(
                    p + f"block_sparse_moe.experts.{e}.w2.weight").T
                f = f + we[:, None] * eo
            if cfg.get("residual_moe"):
                g1 = h @ w(p + "mlp.gate_proj.weight").T
                g3 = h @ w(p + "mlp.up_proj.weight").T
                dense = (F.gelu(g1, approximate="tanh") * g3) @ w(
                    p + "mlp.down_proj.weight").T
                f = (f + dense) / math.sqrt(2.0)
            f = rms(f, w(p + "post_moe_norm.weight"))
            residual = residual + f
        h = rms(residual, w("model.norm.weight"))
        logits = h[-1] @ w("lm_head.weight").T
        logits = logits * cfg["output_multiplier_scale"]
        ids.append(int(logits.argmax()))
    return ids[len(prompt):]


def _build(path, residual_moe):
    import torch
    from safetensors.torch import save_file

    torch.manual_seed(71 + int(residual_moe))
    cfg = dict(
        architectures=["Grok1ForCausalLM"], model_type="grok-1",
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=12,
        intermediate_size=64, moe_intermediate_size=64,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-5, embedding_multiplier_scale=2.0,
        output_multiplier_scale=0.5, attn_logit_softcapping=30.0,
        router_logit_softcapping=30.0, residual_moe=residual_moe,
        tie_word_embeddings=False, torch_dtype="float32",
    )
    H, hd = cfg["hidden_size"], cfg["head_dim"]
    nq, nk, I = (cfg["num_attention_heads"], cfg["num_key_value_heads"],
                 cfg["intermediate_size"])
    V, E = cfg["vocab_size"], cfg["num_local_experts"]

    def t(*shape):
        return (torch.randn(*shape) * 0.08).float()

    weights = {
        "model.embed_tokens.weight": t(V, H),
        "model.norm.weight": 1.0 + 0.05 * torch.randn(H),
        "lm_head.weight": t(V, H),
    }
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        weights.update({
            p + "self_attn.q_proj.weight": t(nq * hd, H),
            p + "self_attn.k_proj.weight": t(nk * hd, H),
            p + "self_attn.v_proj.weight": t(nk * hd, H),
            p + "self_attn.o_proj.weight": t(H, nq * hd),
            p + "block_sparse_moe.gate.weight": t(E, H),
        })
        for n in ("pre_attn_norm", "post_attn_norm", "pre_moe_norm",
                  "post_moe_norm"):
            weights[p + n + ".weight"] = 1.0 + 0.05 * torch.randn(H)
        for e in range(E):
            weights[p + f"block_sparse_moe.experts.{e}.w1.weight"] = t(I, H)
            weights[p + f"block_sparse_moe.experts.{e}.w2.weight"] = t(H, I)
            weights[p + f"block_sparse_moe.experts.{e}.w3.weight"] = t(I, H)
        if residual_moe:
            weights[p + "mlp.gate_proj.weight"] = t(I, H)
            weights[p + "mlp.up_proj.weight"] = t(I, H)
            weights[p + "mlp.down_proj.weight"] = t(H, I)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    save_file(weights, os.path.join(path, "model.safetensors"))
    return cfg, weights


@pytest.mark.parametrize("residual_moe", [False, True],
                         ids=["grok1", "grok2_rmoe"])
def test_grok_parity(tmp_path_factory, residual_moe):
    from tests.test_model_zoo3 import run_core

    path = str(tmp_path_factory.mktemp(f"grok{int(residual_moe)}"))
    cfg, weights = _build(path, residual_moe)
    rng = np.random.default_rng(171)
    prompts = [[int(x) for x in rng.integers(3, 150, size=n)]
               for n in (9, 13)]
    want = [_torch_grok(cfg, weights, p, 6) for p in prompts]
    got = run_core(path, prompts, 6)
    assert got == want, f"got={got} want={want}"
