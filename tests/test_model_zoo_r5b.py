"""Zoo sweep 5b (round 5): dots.llm1, ERNIE 4.5 MoE, HunYuan v1 dense+MoE.

Ref: srt/models/dots.py, srt/models/ernie.py (MoE branch),
srt/models/hunyuan.py. Covers the DSv3 noaux-tc router behind plain GQA
(dots1), Ernie's bias-selected/unbiased-combined top-k with
moe_norm_min clamp, and HunYuan's post-rope q/k head RMSNorm + shared
MLP MoE with per-layer expert lists.
"""

import torch

from tests.test_model_zoo3 import _check


def test_dots1(tmp_path_factory):
    from transformers import Dots1Config
    from transformers import Dots1ForCausalLM as HFModel

    torch.manual_seed(54)
    cfg = Dots1Config(
        vocab_size=160, hidden_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, moe_intermediate_size=32,
        n_routed_experts=8, num_experts_per_tok=2,
        n_shared_experts=1, n_group=2, topk_group=2,
        first_k_dense_replace=1, norm_topk_prob=True,
        routed_scaling_factor=1.5, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    _check(HFModel(cfg), str(tmp_path_factory.mktemp("dots1")), 154)


def test_ernie45_moe(tmp_path_factory):
    from transformers import Ernie4_5_MoeConfig
    from transformers import Ernie4_5_MoeForCausalLM as HFModel

    torch.manual_seed(55)
    cfg = Ernie4_5_MoeConfig(
        vocab_size=160, hidden_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, moe_intermediate_size=32,
        moe_num_experts=8, moe_k=2, moe_num_shared_experts=1,
        moe_layer_start_index=1, moe_layer_interval=1,
        use_bias=False, max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    _check(HFModel(cfg), str(tmp_path_factory.mktemp("ernie_moe")), 155)


def test_hunyuan_dense(tmp_path_factory):
    from transformers import HunYuanDenseV1Config
    from transformers import HunYuanDenseV1ForCausalLM as HFModel

    torch.manual_seed(56)
    cfg = HunYuanDenseV1Config(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=12,
        intermediate_size=64, max_position_embeddings=256,
        attention_bias=False, tie_word_embeddings=False,
    )
    _check(HFModel(cfg), str(tmp_path_factory.mktemp("hy_dense")), 156)


def test_hunyuan_moe(tmp_path_factory):
    from transformers import HunYuanMoEV1Config
    from transformers import HunYuanMoEV1ForCausalLM as HFModel

    torch.manual_seed(57)
    cfg = HunYuanMoEV1Config(
        vocab_size=160, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=12,
        intermediate_size=64, num_experts=4, moe_topk=[2, 2],
        max_position_embeddings=256,
        attention_bias=False, tie_word_embeddings=False,
    )
    _check(HFModel(cfg), str(tmp_path_factory.mktemp("hy_moe")), 157)
