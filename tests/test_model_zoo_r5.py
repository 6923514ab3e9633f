"""Zoo sweep 5 (round 5): GraniteMoeShared, PhiMoE — HF greedy parity.

Ref: srt/models/granitemoe.py, srt/models/phimoe.py. Covers the shared
dense expert added to Granite routing and PhiMoE's sparsemixer routing +
full-LayerNorm + attention/lm_head biases + longrope.
"""

import numpy as np
import pytest

from tests.test_model_zoo3 import _check, hf_greedy, run_core  # noqa: F401


def test_granite_moe_shared(tmp_path_factory):
    import torch
    from transformers import GraniteMoeSharedConfig
    from transformers import GraniteMoeSharedForCausalLM as HFModel

    torch.manual_seed(51)
    cfg = GraniteMoeSharedConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, shared_intermediate_size=96,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256,
        embedding_multiplier=2.0, logits_scaling=3.0,
        residual_multiplier=0.5, attention_multiplier=0.25,
        tie_word_embeddings=False,
    )
    model = HFModel(cfg)
    path = str(tmp_path_factory.mktemp("granite_moe_shared"))
    _check(model, path, seed=151)


def test_phimoe(tmp_path_factory):
    import torch
    from transformers import PhimoeConfig
    from transformers import PhimoeForCausalLM as HFModel

    torch.manual_seed(52)
    cfg = PhimoeConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, original_max_position_embeddings=256,
        rms_norm_eps=1e-5, router_jitter_noise=0.01,
        attention_bias=True, lm_head_bias=True,
        tie_word_embeddings=False,
    )
    model = HFModel(cfg)
    path = str(tmp_path_factory.mktemp("phimoe"))
    _check(model, path, seed=152)


def test_phimoe_longrope(tmp_path_factory):
    """LongRoPE: short factors inside original_max, long factors beyond —
    parity checked with a prompt long enough that HF itself would still be
    in short range (original == max here exercises the table build), plus
    a separate long-table numerical check against HF's formula."""
    import torch
    from transformers import PhimoeConfig
    from transformers import PhimoeForCausalLM as HFModel

    torch.manual_seed(53)
    hd2 = 6  # head_dim=12 -> 6 freqs
    cfg = PhimoeConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, original_max_position_embeddings=64,
        rope_scaling={
            "type": "longrope",
            "short_factor": [1.0 + 0.1 * i for i in range(hd2)],
            "long_factor": [2.0 + 0.5 * i for i in range(hd2)],
            "short_mscale": 1.1,
            "long_mscale": 1.3,
            "original_max_position_embeddings": 64,
        },
        tie_word_embeddings=False,
    )
    model = HFModel(cfg)
    path = str(tmp_path_factory.mktemp("phimoe_lr"))
    _check(model, path, seed=153)

    # Long-table spot check vs HF formula at a position beyond original.
    from sglang_tpu.layers.rotary import RotaryEmbedding

    rot = RotaryEmbedding(12, None, 128, cfg.rope_theta, cfg.rope_scaling)
    base = 1.0 / (cfg.rope_theta ** (np.arange(0, 12, 2) / 12))
    pos = 100
    want = np.cos(pos * base / np.asarray(cfg.rope_scaling["long_factor"]))
    got = np.asarray(rot.cos_table[pos])
    np.testing.assert_allclose(got, want * 1.3, rtol=1e-5)
    # short row uses short factors + short_mscale
    want_s = np.cos(10 * base / np.asarray(cfg.rope_scaling["short_factor"]))
    np.testing.assert_allclose(
        np.asarray(rot.cos_table[10]), want_s * 1.1, rtol=1e-5
    )
