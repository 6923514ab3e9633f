"""Llama 4 text: HF greedy parity.

Ref: srt/models/llama4.py. Exercises interleaved-pair rope on rope
layers, NoPE + temperature tuning, chunked-local attention masks
(attention_chunk_size smaller than the prompt so the chunk mask is
load-bearing), L2 qk-norm, dense/MoE interleave, sigmoid input-scaled
routing, and the shared expert.
"""

import pytest

from tests.test_model_zoo3 import _check


def _cfg(**kw):
    from transformers import Llama4TextConfig

    base = dict(
        vocab_size=160, hidden_size=48, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=12,
        intermediate_size=64, intermediate_size_mlp=80,
        num_local_experts=4, num_experts_per_tok=2,
        interleave_moe_layer_step=2,
        max_position_embeddings=256, rope_theta=10000.0,
        attention_chunk_size=4,
        attn_temperature_tuning=True, floor_scale=4.0, attn_scale=0.1,
        use_qk_norm=True, tie_word_embeddings=False,
    )
    base.update(kw)
    return Llama4TextConfig(**base)


def test_llama4_text(tmp_path_factory):
    import torch
    from transformers import Llama4ForCausalLM

    torch.manual_seed(61)
    model = Llama4ForCausalLM(_cfg())
    _check(model, str(tmp_path_factory.mktemp("llama4")), seed=161, n_new=6)


def test_llama4_no_qk_norm_dense(tmp_path_factory):
    """128E-style: no qk-norm; interleave step 1 = all layers MoE."""
    import torch
    from transformers import Llama4ForCausalLM

    torch.manual_seed(62)
    model = Llama4ForCausalLM(
        _cfg(use_qk_norm=False, interleave_moe_layer_step=1,
             num_hidden_layers=3)
    )
    _check(model, str(tmp_path_factory.mktemp("llama4b")), seed=162, n_new=6)
